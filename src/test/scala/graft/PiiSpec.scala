package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** PII rule-family specs: detector exactness, family non-interference,
  * redaction completeness, and the mass-accounting invariants the
  * panel queries report. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String): Map[String, Long] = {
    val df = Pii.scanCounts(Seq(text).toDF("text"), "text")
    val r = df.collect().head
    Pii.Families.map { case (f, _, _) => f -> r.getAs[Long](s"n_$f") }.toMap
  }

  test("each family detects its own shape and nothing else") {
    assert(counts("mail me at jo.doe@corp.example.org today") ==
      Map("email" -> 1L, "phone" -> 0L, "ipv4" -> 0L, "id9" -> 0L))
    assert(counts("call 555-123-4567 now") ==
      Map("email" -> 0L, "phone" -> 1L, "ipv4" -> 0L, "id9" -> 0L))
    assert(counts("from 10.0.42.254 port 80") ==
      Map("email" -> 0L, "phone" -> 0L, "ipv4" -> 1L, "id9" -> 0L))
    assert(counts("ref 123456789 filed") ==
      Map("email" -> 0L, "phone" -> 0L, "ipv4" -> 0L, "id9" -> 1L))
    assert(counts("no pii in this sentence") ==
      Map("email" -> 0L, "phone" -> 0L, "ipv4" -> 0L, "id9" -> 0L))
  }

  test("id9 word boundary: no match inside longer digit runs or phones") {
    // 10-digit run: \b\d{9}\b cannot fire mid-run
    assert(counts("serial 1234567890 end")("id9") == 0L)
    // phone digit groups are 3-3-4 — no 9-digit run
    assert(counts("call 555-123-4567")("id9") == 0L)
    // ip segments are dotted — no 9-digit run
    assert(counts("10.123.456.789")("id9") == 0L)
  }

  test("families co-exist in one document without interference") {
    val t = "jo@a.com then 555-123-4567 then 10.1.2.3 then ref 987654321"
    assert(counts(t) ==
      Map("email" -> 1L, "phone" -> 1L, "ipv4" -> 1L, "id9" -> 1L))
  }

  test("redact masks every match; rescanning the output finds nothing") {
    val t = "jo@a.com then 555-123-4567 then 10.1.2.3 then ref 987654321"
    val red = Seq(t).toDF("text")
      .select(Pii.redact(col("text")).as("r")).as[String].collect().head
    assert(red == "<EMAIL> then <PHONE> then <IP> then ref <ID>")
    val rescanned = Pii.scanCounts(Seq(red).toDF("text"), "text").collect().head
    Pii.Families.foreach { case (f, _, _) =>
      assert(rescanned.getAs[Long](s"n_$f") == 0L, s"family $f survived") }
  }

  test("synthetic augmentation is the documented doc_id formula") {
    // doc_id = 105: %3 = 0 (email), %5 = 0 (phone), %7 = 0 (ip), %11 ≠ 0
    val got = Seq((105L, "base")).toDF("doc_id", "text")
      .select(Pii.withSyntheticPii(col("doc_id"), col("text")).as("t"))
      .as[String].collect().head
    assert(got == "base contact user105@mail0.example.com" +
      " call 305-305-1105 from 10.105.5.106")
    assert(counts(got) ==
      Map("email" -> 1L, "phone" -> 1L, "ipv4" -> 1L, "id9" -> 0L))
    // doc_id = 1: no family fires, text unchanged
    val none = Seq((1L, "base")).toDF("doc_id", "text")
      .select(Pii.withSyntheticPii(col("doc_id"), col("text")).as("t"))
      .as[String].collect().head
    assert(none == "base")
  }

  test("doc stats: token mass invariant, char mass strictly drops") {
    // doc_id 33: email (%3) AND id9 (%11)
    val stats = graft.queries.PiiQueries.docStatsFor(
        Seq((33L, "s0", "plain words here")).toDF("doc_id", "source", "text"))
      .collect().head
    assert(stats.getAs[Long]("n_email") == 1L)
    assert(stats.getAs[Long]("n_id9") == 1L)
    assert(stats.getAs[Long]("tokens_before") ==
      stats.getAs[Long]("tokens_after"))
    assert(stats.getAs[Long]("chars_after") <
      stats.getAs[Long]("chars_before"))
    assert(stats.getAs[Long]("is_redacted") == 1L)
  }

  test("empty text does not crash the stats (ANSI-safe)") {
    val stats = graft.queries.PiiQueries.docStatsFor(
        Seq((1L, "s0", "")).toDF("doc_id", "source", "text"))
      .collect().head
    assert(stats.getAs[Long]("chars_before") == 0L)
    assert(stats.getAs[Long]("is_redacted") == 0L)
    // split("") = [""] on both engines — token count 1, never 0
    assert(stats.getAs[Long]("tokens_before") == 1L)
  }
}
