package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The user-extensibility trio the reference lacks entirely (SURVEY
  * §2.10) but a complete Spark library must expose: scalar UDFs are
  * covered by the native expressions in [[VectorExprs]]/[[TextHashExprs]];
  * this file adds the UDAF (typed `Aggregator`) and UDTF (`Generator`)
  * paths, each exercised by an oracle-matched registry query.
  */

/** Typed UDAF: discount-weighted mean quantity with EXACT integer
  * arithmetic — inputs are ≤4-decimal values, so `round(v*w*1e8)` /
  * `round(w*1e4)` are exact integers and the Long sums are
  * order-independent (the same cross-engine-determinism trick as
  * [[graft.queries.Canon]], in micro-units instead of DECIMAL).
  *
  * The buffer is a flat Tuple2[Long,Long] (primitive encoder — top-level
  * type, so no codegen fallback); partial merges are Long adds, making
  * the aggregate fully distributive (map-side combine + final merge,
  * identical plan shape to a built-in sum). Scale note: Long micros
  * saturate around Σ|v·w| ≈ 9.2e10 — beyond that, widen the buffer to
  * DECIMAL(38,8), keeping the same distributive shape.
  */
class WeightedMeanMicros extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (v, w) = in
    (b._1 + math.round(v * w * 1e8), b._2 + math.round(w * 1e4))
  }
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) 0.0
    else (b._1.toDouble / 1e8) / (b._2.toDouble / 1e4)
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMeanMicros {
  /** Idempotent session registration as `wmean_micros(v, w)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("wmean_micros",
      org.apache.spark.sql.functions.udaf(new WeightedMeanMicros,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
}

/** UDTF: word n-gram generator — one output row per shingle, produced
  * directly in the row pipeline (`LATERAL VIEW shingle_gen(text, n)`).
  * Equivalent to `explode(wordShingles(text, n))` but without
  * materializing the intermediate array: for a 10k-token document the
  * built-in form allocates a 10k-element array per row before exploding,
  * while the generator streams rows out one at a time.
  */
case class ShingleGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_gen requires (string, positive literal int), got " +
          s"${child.dataType.simpleString}, $n")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      // split on single spaces, preserving empty tokens — identical to
      // TextOps.tokenize (Spark split) and DuckDB string_split
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < n) Iterator.empty
      else (0 to words.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override def prettyName: String = "shingle_gen"
  override protected def withNewChildInternal(c: Expression): ShingleGen =
    copy(child = c)
}
