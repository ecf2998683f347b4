package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: print the formatted physical plan of selected queries.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[8]"), 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --exec: run the query first, so the printed plan is AQE's FINAL
    // adaptive plan (runtime join-strategy conversions, coalesced
    // reads) rather than the static initial plan
    val exec = args.contains("--exec")
    val names0 = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val names = names0.filterNot(_ == "--exec")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      val df = SparkEntry.queries(n)(spark, dir)
      if (exec) {
        try df.queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
