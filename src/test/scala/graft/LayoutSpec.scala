package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order clustering laws. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits exactly (known values)") {
    // a=0b11 (bits→positions 0,2), b=0b01 (bit→position 1): z = 0b0111
    val got = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b")).as[Long].head()
    assert(got == 7L)
    // a=0, b=0b11 → bits at positions 1,3 = 0b1010
    val got2 = Seq((0L, 3L)).toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b")).as[Long].head()
    assert(got2 == 10L)
  }

  test("zorderKey is a bijection on the 16-bit grid sample") {
    val df = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val keys = df.select(Layout.zorderKey($"a", $"b")).as[Long].collect()
    assert(keys.distinct.length == 64 * 64)
    assert(keys.min == 0L && keys.max == 4095L) // 64×64 grid fills [0, 2^12)
  }

  test("aligned z-buckets are 128x128 rectangles (both dims bounded)") {
    val rows = graft.queries.RelationalQueries
      .zorderLocality(spark, "/root/testdata/sf0.001")
      .select($"max_p" - $"min_p", $"max_s" - $"min_s")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dp, ds) =>
      assert(dp <= 127 && ds <= 127,
        s"z-bucket spread ($dp, $ds) exceeds the aligned 128x128 law")
    }
  }

  test("clusterByZ yields disjoint, ordered z-ranges per partition") {
    val df = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val parts = Layout.clusterByZ(df, col("l_partkey"), col("l_suppkey"), 8)
      .select(spark_partition_id().as("pid"),
              Layout.zorderKey(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy($"pid").agg(min($"z").as("lo"), max($"z").as("hi"))
      .orderBy($"lo")
      .as[(Int, Long, Long)].collect()
    assert(parts.length > 1)
    parts.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 <= lo2, "partition z-ranges overlap: clustering broken")
    }
  }
}
