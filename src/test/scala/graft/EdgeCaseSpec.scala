package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

/** Empty-input behavior of the composed operators (the reference
  * divides by zero on an empty directory, SURVEY §2.4 — the engine
  * must instead return empty results everywhere). */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters on an empty pair list converges to an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dupClusters(empty, "doc_a", "doc_b").count() == 0)
  }

  test("bloom semi join with an empty build side returns no rows") {
    val big = (1L to 50L).toDF("k")
    val none = Seq.empty[Long].toDF("sk")
    assert(Relational.bloomSemiJoin(big, none, "k", "sk").count() == 0)
  }

  test("salted join with an empty small side returns no rows") {
    val big = (1L to 50L).map(k => (k, k)).toDF("k", "row_id")
    val none = Seq.empty[(Long, String)].toDF("k", "tag")
    assert(Relational.saltedJoin(big, none, "k", $"row_id", 4).count() == 0)
  }

  test("forward and backward asof joins keep all left rows when right is empty") {
    val clicks = Seq((1L, 10L, 1L), (2L, 20L, 2L))
      .toDF("user_id", "ts_us", "click_id")
    val none = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "ts_us", "purchase_id")
    for (fwd <- Seq(false, true)) {
      val out = Relational.asofJoin(clicks, none, Seq("user_id"),
                                    "ts_us", "ts_us", "purchase_id",
                                    forward = fwd)
        .select($"click_id", $"__asof").as[(Long, Option[Long])]
        .collect().toMap
      assert(out == Map(1L -> None, 2L -> None))
    }
  }
}
