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

  test("starJoin broadcasts every dimension") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust", "tier")
    val joined = Relational.starJoin(orders, Seq((dim, Seq("cust"))))
    assert(joined.count() == 4)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }
}
