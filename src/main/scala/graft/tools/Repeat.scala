package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: time one query N times. runMain graft.tools.Repeat <name> [n] [sfDir] */
object Repeat {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"[repeat] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
