package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale posture evidence (SURVEY §8.3): pre-bucketed tables co-locate
  * join keys, so a key-equi join plans WITHOUT any shuffle exchange —
  * the 100 TB answer to repeated large-large joins (bucket once, join
  * many times). */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ
    try {
      Tables.orders(spark, dir).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, dir).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      joined.collect() // force planning + execution
      val plan = joined.queryExecution.executedPlan.toString
      // the join must read the bucketed scans directly — no exchange on
      // either join key (the final 1-column aggregation may still shuffle)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
             s"expected a non-broadcast join, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
             s"bucketed join must not shuffle its inputs:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
