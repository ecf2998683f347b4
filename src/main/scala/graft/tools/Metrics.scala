package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.SparkEntry

/** Dev-only: execute a query and dump per-operator runtime metrics
  * (rows, shuffle bytes, spills) — the observability loop for spill- and
  * shuffle-aware tuning. Usage:
  *   runMain graft.tools.Metrics <queryName> [sfDir]
  */
object Metrics {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count() // execute so metrics populate

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
      case q: QueryStageExec => finalPlan(q.plan)
      case other => other
    }
    val interesting = Set("numOutputRows", "dataSize", "spillSize",
                          "shuffleBytesWritten", "recordsRead",
                          "numFiles", "peakMemory")
    val out = mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan, depth: Int): Unit = {
      val m = p.metrics.filter { case (k, v) =>
        interesting.contains(k) && v.value > 0
      }
      val ms = m.map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
      out += ("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else "")
      p.children.foreach(c => walk(finalPlan(c), depth + 1))
      // follow reused/united subqueries lightly via innerChildren
      p.innerChildren.collect { case sp: SparkPlan => sp }
        .foreach(c => walk(finalPlan(c), depth + 1))
    }
    walk(finalPlan(df.queryExecution.executedPlan), 0)
    println(s"########## metrics: $name @ $dir ##########")
    out.foreach(println)
    spark.stop()
  }
}
