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
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
