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

  test("compact rewrites a fragmented directory into the target file count") {
    val base = Files.createTempDirectory("graft_compact").toString
    // fragment: 20 tiny files of 3 rows each
    val rows = (1L to 60L).map(i => (i, s"g${i % 4}", i * 1.5))
      .toDF("id", "grp", "v")
    rows.repartition(20).write.parquet(s"$base/frag")
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/frag") == 20)
    Sinks.compact(spark, s"$base/frag", s"$base/opt", targetFiles = 2)
    assert(parquetFiles(s"$base/opt") == 2)
    // data survives byte-for-byte
    val before = rows.as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val after = spark.read.parquet(s"$base/opt")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(after == before)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("schema evolution: mergeSchema unifies batches with differing columns") {
    val base = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.mode("append").parquet(base)
    Seq((2L, 9.5)).toDF("id", "score").write.mode("append").parquet(base)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.select($"id", $"name", $"score")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some("a"), None), (2L, None, Some(9.5))))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
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
