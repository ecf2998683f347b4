package graft

import org.apache.spark.sql.functions._

import graft.functions.WeightedMeanMicros
import graft.operators.TextOps

/** UDAF (typed Aggregator) + UDTF (Generator) extension-path laws. */
class ExtensibilitySpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMeanMicros equals the algebraic weighted mean, exactly") {
    WeightedMeanMicros.register(spark)
    val df = Seq((10.0, 0.5), (20.0, 0.25), (30.0, 0.25))
      .toDF("v", "w")
    val got = df.agg(call_function("wmean_micros", $"v", $"w"))
      .as[Double].head()
    // Σvw = 5 + 5 + 7.5 = 17.5; Σw = 1.0
    assert(got == 17.5)
  }

  test("WeightedMeanMicros: zero total weight yields 0.0, not NaN") {
    WeightedMeanMicros.register(spark)
    val got = Seq((10.0, 0.0), (20.0, 0.0)).toDF("v", "w")
      .agg(call_function("wmean_micros", $"v", $"w")).as[Double].head()
    assert(got == 0.0)
  }

  test("WeightedMeanMicros is repartition-invariant (distributive merge)") {
    WeightedMeanMicros.register(spark)
    val df = (1 to 1000).map(i => (i.toDouble, (i % 7).toDouble / 4))
      .toDF("v", "w")
    val one = df.coalesce(1)
      .agg(call_function("wmean_micros", $"v", $"w")).as[Double].head()
    val many = df.repartition(13)
      .agg(call_function("wmean_micros", $"v", $"w")).as[Double].head()
    assert(one == many)
  }

  test("shingle_gen matches explode(wordShingles) bit for bit") {
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"), (4L, ""))
      .toDF("id", "text")
    docs.createOrReplaceTempView("sg_docs")
    val viaGen = spark.sql(
      "SELECT id, shingle FROM sg_docs LATERAL VIEW shingle_gen(text, 3) t AS shingle")
      .as[(Long, String)].collect().sorted.toSeq
    val viaBuiltin = docs.select($"id",
        explode(TextOps.wordShingles($"text", 3)).as("shingle"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaGen == viaBuiltin)
    assert(viaGen == Seq((1L, "a b c"), (1L, "b c d")))
  }

  test("shingle_gen: null text and OUTER lateral view") {
    Seq((1L, Some("a b")), (2L, None)).toDF("id", "text")
      .createOrReplaceTempView("sg_null")
    // plain LATERAL VIEW drops null/short docs
    assert(spark.sql(
      "SELECT id FROM sg_null LATERAL VIEW shingle_gen(text, 2) t AS s")
      .as[Long].collect().toSeq == Seq(1L))
    // OUTER keeps them with a NULL shingle
    val outer = spark.sql(
      "SELECT id, s FROM sg_null LATERAL VIEW OUTER shingle_gen(text, 2) t AS s")
      .as[(Long, Option[String])].collect().toSet
    assert(outer == Set((1L, Some("a b")), (2L, None)))
  }
}
