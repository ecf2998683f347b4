package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-hash expressions. The composed-builtins forms
  * (16 `aggregate` HOFs for SimHash; explode → 12 min-aggregates for
  * MinHash) are semantically identical but pay interpreted lambda frames
  * per element, recompute the per-word md5 per bit, and (MinHash) shuffle
  * an exploded shingle table. These run one md5 per token per row inside
  * the row pipeline — map-side only, no shuffle, no explode.
  *
  * Determinism contract: identical md5-derived values to the SQL forms
  * (`CAST('0x' || substr(md5(x),1,n) AS ...)`), so the DuckDB oracle is
  * unchanged.
  */
object TextHash {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 16 bits of md5(word) — the per-word sketch. */
  private def sketch16(md: MessageDigest, w: UTF8String): Int = {
    md.reset()
    val d = md.digest(w.getBytes)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  /** 16-bit SimHash over a token array (multiplicity-weighted). */
  def simHash16(tokens: ArrayData): Int = {
    val md = md5Local.get()
    val votes = new Array[Int](16)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = sketch16(md, tokens.getUTF8String(i))
      var b = 0
      while (b < 16) {
        votes(b) += (if (((s >> b) & 1) == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) { if (votes(b) >= 0) out |= (1 << b); b += 1 }
    out
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 60 bits of md5("<seed>|<shingle>") as a non-negative long —
    * value-identical to CAST('0x' || substr(md5(...),1,15) AS BIGINT). */
  private def seededHash60(md: MessageDigest, seedPrefix: Array[Byte],
                           s: UTF8String): Long = {
    md.reset()
    md.update(seedPrefix)
    val d = md.digest(s.getBytes)
    // 15 hex digits = 60 bits = 7.5 bytes, big-endian like the hex string
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** k min-hashes over a shingle array; null when the array is empty
    * (mirrors "no signature for sub-shingle docs"). */
  def minHashSigs(shingles: ArrayData, k: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = md5Local.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var seed = 1
    while (seed <= k) {
      val prefix = s"$seed|".getBytes(StandardCharsets.UTF_8)
      var i = 0
      var m = Long.MaxValue
      while (i < n) {
        val h = seededHash60(md, prefix, shingles.getUTF8String(i))
        if (h < m) m = h
        i += 1
      }
      mins(seed - 1) = m
      seed += 1
    }
    new GenericArrayData(mins)
  }

  private val EmptyShingles = new GenericArrayData(Array.empty[Any])

  /** Word n-gram shingles over single-space tokenization; empty array
    * (never null) for sub-n documents. Output-identical to the builtin
    * composition `transform(sequence(1, size(toks)-n+1), i =>
    * concat_ws(" ", slice(toks, i, n)))` with `toks = split(text, " ")`
    * — but that form re-evaluates the split once PER INDEX (the lambda
    * body closes over `toks`, and higher-order functions are
    * CodegenFallback, so every shingle pays an interpreted O(|text|)
    * re-split: O(tokens²) splitting per document, measured as the
    * dominant cost of every shingle pipeline). This is one split and
    * one pass: O(|text| + shingles·n), fully codegen'd. */
  def wordShingles(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return EmptyShingles
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API surface for the native text-hash expressions. */
object TextHashFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  def simHash16(tokens: Column): Column =
    ColumnShim.column(SimHash16(ColumnShim.expression(tokens)))

  def minHashSigs(shingles: Column, k: Int): Column =
    ColumnShim.column(MinHashSigs(ColumnShim.expression(shingles), k))

  def wordShingles(text: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(text), n))
}

/** simhash16(tokens: array<string>) → int */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 requires array<string>, got ${t.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHash.simHash16(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simHash16($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** word_shingles(text, n) → array<string> (empty for sub-n docs; null only
  * for null text — [[graft.operators.TextOps.wordShingles]] coalesces that
  * back to the empty array the builtin composition produced). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires (string, positive n), got " +
          s"${child.dataType.simpleString}, $n")

  override def nullSafeEval(v: Any): Any =
    TextHash.wordShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_sigs(shingles: array<string>, k) → array<bigint> (null if empty) */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs requires array<string>, got ${t.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHash.minHashSigs(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextHash.minHashSigs($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
