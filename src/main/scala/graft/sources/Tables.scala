package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-provided parquet fixtures (see FIXTURES.md §2).
  *
  * Reference analog: the directory-scan + extension-filter source
  * (`send_file_paths.cpp:22-28`) — here the source is a columnar parquet
  * scan planned by Catalyst (`FileSourceScanExec`), which subsumes the
  * reference's static block partitioning (`send_file_paths.cpp:37-44`)
  * with dynamic split scheduling. At 100 TB the same call scales by
  * split planning (`spark.sql.files.maxPartitionBytes`); nothing here is
  * driver-materialized.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Schema-adaptive events load. The fixture's `ts` encoding has varied
    * across driver regenerations — parquet TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects, [PARQUET_TYPE_ILLEGAL]) and plain
    * timestamp[us] — so adapt to whatever is on disk and emit ONE stable
    * contract downstream: `ts` TIMESTAMP_NTZ (µs) + `ts_ns` BIGINT
    * epoch-nanos.
    *
    *  - Nanos fixture: read raw int64 via `legacy.parquet.nanosAsLong`,
    *    rebuild µs with `DIV` (not `/`: double division of ~1.7e18 loses
    *    precision past 2^53; truncation matches DuckDB's TIMESTAMP_NS →
    *    TIMESTAMP cast).
    *  - µs fixture: pass `ts` through as TIMESTAMP_NTZ and derive
    *    `ts_ns = unix_micros(CAST(ts AS TIMESTAMP)) * 1000` — session TZ
    *    is UTC so the NTZ→TZ cast is exact, and µs×1000 (~1.7e18) stays
    *    inside BIGINT. Downstream `ts_ns DIV 1000` then reproduces the
    *    exact same µs DuckDB reads natively from the parquet.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts",
            timestamp_micros(expr("ts_ns DIV 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts_ns", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** The embeddings fixture is fixed-width (64-dim float, TESTDATA.md);
    * parquet list types don't carry the length, so stamp it as column
    * metadata — `Similarity.embeddingDims` reads it with zero cost
    * instead of running a LIMIT-1 inference job at plan construction. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "embeddings")
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(graft.operators.Similarity.DimsMetadataKey, 64L).build()
    df.withColumn("embedding", df("embedding").as("embedding", md))
  }

  /** Spread a (small-file) input across the cluster's cores before
    * compute-heavy per-row work: a 2 MB parquet arrives as ONE split, so
    * md5-heavy operators would otherwise run single-threaded regardless
    * of cluster size. No-op when the input already has enough
    * partitions (the 100 TB case — real inputs arrive pre-split). */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Glob-filtered file scan — Spark-native form of the reference's
    * rank-0 `.tif` directory listing (`send_file_paths.cpp:22-28`).
    * Listing and split planning are distributed; the predicate prunes
    * files before any byte is read.
    */
  def binaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
}
