package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Queries, SparkEntry}
import graft.sources.Tables

/** Dev-only smoke: read every fixture table (incl. the timestamp[ns]
  * events parquet) and run every registered query at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, dir, t)
        println(s"[smoke] $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch { case e: Throwable =>
        println(s"[smoke] $t FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    Queries.registry.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        println(s"[smoke] query $name rows=${df.count()}")
        df.show(3, truncate = false)
      } catch { case e: Throwable =>
        println(s"[smoke] query $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[smoke] entry rows=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
