package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Seq(
    (1L, 101L, 50.0), (1L, 102L, 70.0), (1L, 103L, 70.0),  // tie on price
    (2L, 201L, 10.0)
  ).toDF("cust", "okey", "price")

  test("topKPerGroup: tie-break determinism, k larger than group") {
    val top2 = Relational.topKPerGroup(orders, Seq("cust"),
      Seq($"price".desc, $"okey".asc), 2)
      .select($"cust", $"okey", $"rn").as[(Long, Long, Int)].collect().toSet
    // ties on price resolved by okey asc: 102 before 103
    assert(top2 == Set((1L, 102L, 1), (1L, 103L, 2), (2L, 201L, 1)))
  }

  test("globalTopK: deterministic order, empty input") {
    val top = Relational.globalTopK(orders,
      Seq($"price".desc, $"okey".asc), 3)
      .select($"okey").as[Long].collect().toSeq
    assert(top == Seq(102L, 103L, 101L))
    assert(Relational.globalTopK(orders.filter(lit(false)),
      Seq($"price".desc), 5).count() == 0)
  }

  test("topKPerGroup plans a WindowGroupLimit (rank filter pushed below the sort)") {
    val df = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val plan = Relational.topKPerGroup(
      df.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .queryExecution.executedPlan.toString
    // the rn <= k predicate must become a WindowGroupLimit, which keeps
    // only k rows per group BEFORE the full window sort materializes —
    // the difference between a top-k and a full per-group sort at scale
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("join hints flip the physical strategy without changing results") {
    val dir = "/root/testdata/sf0.001"
    val ord = graft.sources.Tables.orders(spark, dir)
    val cust = graft.sources.Tables.customer(spark, dir)
    def agg(hinted: org.apache.spark.sql.DataFrame) =
      ord.join(hinted, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    val merge = agg(cust.hint("merge"))
    val shash = agg(cust.hint("shuffle_hash"))
    val plain = agg(cust)
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    assert(shash.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    assert(plain.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val rows = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merge.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == rows)
    assert(shash.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == rows)
  }

  test("starJoin broadcasts every dimension") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust", "tier")
    val joined = Relational.starJoin(orders, Seq((dim, Seq("cust"))))
    assert(joined.count() == 4)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }

  test("profileColumns: unpivot keeps nulls; ndv/min/max/sum exact") {
    val df = Seq(
      (Option(1L), Option(1.5)),
      (Option(2L), Option(1.5)),
      (Option(3L), None: Option[Double]),
      (None: Option[Long], Option(2.25))
    ).toDF("k", "x")
    val rows = Relational.profileColumns(df, Seq("k", "x"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("k") == (("k", 4L, 1L, 3L, 1.0, 3.0, 6.0)))
    assert(rows("x") == (("x", 4L, 1L, 2L, 1.5, 2.25, 5.25)))
  }
}
