package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for rel_cc_chain: times the edge build, the
  * contraction loop, and the final aggregate separately so loop tuning
  * targets the real cost. Not part of the driver contract. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ccprof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 3) {
      val o = graft.sources.Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val edges = o.withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("o_orderkey").as("a"), col("nxt").as("b"))
        .unionAll(o.select(col("o_orderkey").as("a"),
                           col("o_orderkey").as("b")))
      val edgesMat = t(s"run$i edge-build")(edges.localCheckpoint())
      val cc = t(s"run$i ccStar-loop")(
        graft.operators.Graphs.ccStar(edgesMat, "a", "b"))
      t(s"run$i final-agg")(
        cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_orders"))
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
