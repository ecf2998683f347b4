package graft

import graft.operators.Relational

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest prior, <= at equal ts, null when no prior") {
    val clicks = Seq(
      (1L, 100L, 10L),  // user 1, ts 100 → purchase at 90
      (1L, 50L, 11L),   // ts 50  → purchase at 50 (equal ts counts)
      (1L, 40L, 12L),   // ts 40  → none prior → null
      (2L, 100L, 13L)   // user 2 → no purchases at all → null
    ).toDF("user_id", "ts_us", "click_id")
    val purchases = Seq(
      (1L, 50L, 900L),
      (1L, 90L, 901L),
      (1L, 120L, 902L)  // after every click — never attributed
    ).toDF("user_id", "ts_us", "purchase_id")

    val got = Relational.asofJoin(clicks, purchases, Seq("user_id"),
                                  "ts_us", "ts_us", "purchase_id")
      .select($"click_id", $"__asof").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(10L -> Some(901L), 11L -> Some(900L),
                      12L -> None, 13L -> None))
  }

  test("forward asof join: earliest at-or-after, >= at equal ts") {
    val clicks = Seq(
      (1L, 100L, 10L),  // ts 100 → next purchase at 120
      (1L, 50L, 11L),   // ts 50  → purchase at 50 (equal ts counts)
      (1L, 130L, 12L),  // ts 130 → none after → null
      (2L, 100L, 13L)   // user 2 → no purchases at all → null
    ).toDF("user_id", "ts_us", "click_id")
    val purchases = Seq(
      (1L, 50L, 900L),
      (1L, 90L, 901L),
      (1L, 120L, 902L)
    ).toDF("user_id", "ts_us", "purchase_id")

    val got = Relational.asofJoin(clicks, purchases, Seq("user_id"),
                                  "ts_us", "ts_us", "purchase_id",
                                  forward = true)
      .select($"click_id", $"__asof").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(10L -> Some(902L), 11L -> Some(900L),
                      12L -> None, 13L -> None))
  }

  test("asof join preserves left cardinality") {
    val clicks = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("user_id", "ts_us", "click_id")
    val purchases = Seq((1L, 5L, 7L)).toDF("user_id", "ts_us", "purchase_id")
    assert(Relational.asofJoin(clicks, purchases, Seq("user_id"),
                               "ts_us", "ts_us", "purchase_id").count() == 3)
  }
}
