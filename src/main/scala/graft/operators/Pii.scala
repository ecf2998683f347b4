package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction over a text column — the curation staple
  * every public-web corpus pipeline runs before release (C4 strips
  * "bad words" pages; the BigScience ROOTS and Dolma pipelines run
  * exactly this rule-family shape: regex detectors for emails, phone
  * numbers, IP addresses and ID-shaped integers, then an in-place
  * masked rewrite with before/after mass accounting).
  *
  * Design constraints:
  *  - Patterns stay in the ASCII subset where Java regex (Spark) and
  *    RE2 (DuckDB) agree: character classes, bounded repetition, `\b`
  *    word boundaries, `\d` — no lookaround, no backreferences, no
  *    Unicode classes. Both engines use leftmost-first greedy
  *    semantics on these constructs, so match sets are identical.
  *  - Redaction is a FIXED family order (email → phone → IPv4 → ID9)
  *    of global `regexp_replace` passes with constant replacement
  *    tokens; the families are constructed non-overlapping (an email
  *    has an `@`, a phone has dashes, an IPv4 has dots, an ID9 is a
  *    9-digit run — and `\b` cannot fire inside a longer digit run),
  *    so the order is semantically irrelevant but is pinned anyway
  *    for bit-identical cross-engine output.
  *  - Everything is per-row map work: at 100 TB the scan/redact is
  *    embarrassingly parallel (no shuffle), and the density rollup is
  *    one map-side-combined aggregation on the grouping key.
  *
  * The fixture corpus is synthetic word salad with no PII, so
  * [[withSyntheticPii]] manufactures deterministic PII IN-PLAN from
  * pure integer arithmetic over `doc_id` (the RasterQueries
  * manufacture-blobs pattern) — the oracle replays the identical
  * formula, and the detectors exercise real matches at every scale.
  */
object Pii {

  /** Rule families, keyed for the long-format panel. Each value is a
    * (Java ∩ RE2)-safe pattern and its replacement token. */
  val Email = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,4}"
  val Phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val Id9 = "\\b\\d{9}\\b"

  /** (family, pattern, replacement) in the pinned redaction order. */
  val Families: Seq[(String, String, String)] = Seq(
    ("email", Email, "<EMAIL>"),
    ("phone", Phone, "<PHONE>"),
    ("ipv4", Ipv4, "<IP>"),
    ("id9", Id9, "<ID>"))

  /** Deterministic synthetic PII appended to `textCol` from integer
    * arithmetic over `idCol` (nonnegative): every 3rd doc gains an
    * email, every 5th a phone, every 7th an IPv4, every 11th a 9-digit
    * id. All digit groups have fixed widths (no padding ambiguity) and
    * both engines render BIGINT→string identically. [[syntheticSql]]
    * is the same formula in DuckDB SQL. */
  def withSyntheticPii(idCol: Column, textCol: Column): Column = {
    def d(c: Column): Column = c.cast("string")
    concat(
      textCol,
      when(idCol % 3 === 0,
        concat(lit(" contact user"), d(idCol), lit("@mail"),
               d(idCol % 7), lit(".example.com"))).otherwise(lit("")),
      when(idCol % 5 === 0,
        concat(lit(" call "), d(idCol % 700 + 200), lit("-"),
               d(idCol % 800 + 200), lit("-"),
               d(idCol % 9000 + 1000))).otherwise(lit("")),
      when(idCol % 7 === 0,
        concat(lit(" from 10."), d(idCol % 256), lit("."),
               d(idCol % 100), lit("."), d(idCol % 254 + 1)))
        .otherwise(lit("")),
      when(idCol % 11 === 0,
        concat(lit(" ref "), d(idCol % 900000000 + 100000000)))
        .otherwise(lit("")))
  }

  /** DuckDB twin of [[withSyntheticPii]] over columns `id` and `txt`
    * (SQL expressions, e.g. "doc_id" and "text"). */
  def syntheticSql(id: String, txt: String): String =
    s"""$txt
       | || CASE WHEN $id % 3 = 0 THEN ' contact user' || CAST($id AS VARCHAR)
       |      || '@mail' || CAST($id % 7 AS VARCHAR) || '.example.com'
       |      ELSE '' END
       | || CASE WHEN $id % 5 = 0 THEN ' call '
       |      || CAST($id % 700 + 200 AS VARCHAR) || '-'
       |      || CAST($id % 800 + 200 AS VARCHAR) || '-'
       |      || CAST($id % 9000 + 1000 AS VARCHAR) ELSE '' END
       | || CASE WHEN $id % 7 = 0 THEN ' from 10.'
       |      || CAST($id % 256 AS VARCHAR) || '.'
       |      || CAST($id % 100 AS VARCHAR) || '.'
       |      || CAST($id % 254 + 1 AS VARCHAR) ELSE '' END
       | || CASE WHEN $id % 11 = 0 THEN ' ref '
       |      || CAST($id % 900000000 + 100000000 AS VARCHAR) ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** Masked rewrite: all four families replaced in the pinned order.
    * Pure per-row map — codegen'd regexp_replace chain, no shuffle. */
  def redact(textCol: Column): Column =
    Families.foldLeft(textCol) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** DuckDB twin of [[redact]] over a SQL text expression. */
  def redactSql(txt: String): String =
    Families.foldLeft(txt) { case (e, (_, pat, repl)) =>
      s"regexp_replace($e, '$pat', '$repl', 'g')"
    }

  /** Per-row detection counts: one `n_<family>` LONG column per rule
    * family (regexp_count — a single codegen'd pass per pattern). */
  def scanCounts(df: DataFrame, textCol: String): DataFrame =
    Families.foldLeft(df) { case (d, (fam, pat, _)) =>
      d.withColumn(s"n_$fam",
        regexp_count(col(textCol), lit(pat)).cast("long"))
    }
}
