package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0)
  ).toDF("id", "grp", "v")

  test("partitioned write creates hive-style dirs and round-trips") {
    val dir = Files.createTempDirectory("graft_sink").toString
    Sinks.writePartitioned(sample, Seq("grp"), dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("grp="))
    assert(dirs.toSet == Set("grp=A", "grp=B"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partition pruning: only the grp=A directory is read
    val pruned = back.filter($"grp" === "A")
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("grp=B"))
  }

  test("csv and json round-trip with schema") {
    val dir = Files.createTempDirectory("graft_sink2")
    Sinks.writeCsv(sample, s"$dir/csv")
    Sinks.writeJson(sample, s"$dir/json")
    val csv = spark.read.option("header", "true")
      .schema(sample.schema).csv(s"$dir/csv")
    val json = spark.read.schema(sample.schema).json(s"$dir/json")
    assert(csv.collect().toSet == sample.collect().toSet)
    assert(json.collect().toSet == sample.collect().toSet)
  }

  test("sorted parquet write preserves data and clusters row groups") {
    val dir = Files.createTempDirectory("graft_sink3").toString
    Sinks.writeSortedParquet(Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_extendedprice"), Seq("l_orderkey"), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 6000)
  }
}
