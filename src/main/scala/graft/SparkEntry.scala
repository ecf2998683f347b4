package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the LLM-pipeline extensions) is
  * registered here as a named query over the parquet fixtures, with an
  * ANSI-SQL twin in [[oracleSql]] runnable by DuckDB on the same tables.
  *
  * Cross-engine float determinism (SURVEY §7.4): double summation order
  * differs between Spark's partial aggregation and DuckDB, so floating
  * aggregates of the exact-≤4-decimal fixture columns are computed as
  * exact DECIMAL sums divided (in IEEE double) by counts on BOTH sides —
  * bit-identical results, no tolerance or rounding needed. See
  * [[graft.operators.BandStats]] scaladoc and [[Queries.sqlAvg]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline computation: two-level band statistics
    * (per-group filtered means, then per-band mean/max/min of means).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.bandStatsFlagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.registry

  def oracleSql: Map[String, String] = Queries.oracles
}

/** Query registry: one entry per implemented operator, fixture-realized
  * per FIXTURES.md §3 (fixture group keys stand in for (file, band)).
  */
object Queries {

  /** DuckDB twin of the engines' shared exact-mean canonicalization:
    * exact decimal sum, IEEE-double division by the non-null count. */
  def sqlAvg(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT($x)"

  /** DuckDB twin of the DECIMAL(18,6)-quantized level-1 mean. */
  def sqlAvgQ6(x: String): String =
    s"CAST(${sqlAvg(x)} AS DECIMAL(18,6))"

  // ---------------------------------------------------------------- band stats

  /** A1: per-(file,band) filtered mean — events (user_id, event_type)
    * realization, nodata filter on value. */
  def bandFileMeans(s: SparkSession, dir: String): DataFrame =
    BandStats.bandFileMeans(Tables.events(s, dir), "user_id", "event_type",
                            "value", exact = true)

  /** Level-1 over lineitem used by the level-2 rollups: per
    * (order, returnflag) quantized mean of non-zero discounts. */
  private def orderDiscountMeans(s: SparkSession, dir: String): DataFrame =
    BandStats.bandFileMeansQuantized(
      Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "file"),
      "file", "l_returnflag", "l_discount")

  private val orderDiscountMeansSql =
    s"""SELECT l_orderkey AS file, l_returnflag, ${sqlAvgQ6("l_discount")} AS mean_value
       |FROM lineitem WHERE l_discount <> 0 GROUP BY 1, 2""".stripMargin

  /** A2: mean-of-means (collective-mean program semantics). */
  def bandMeanOfMeans(s: SparkSession, dir: String): DataFrame =
    BandStats.bandMeanOfMeans(orderDiscountMeans(s, dir), "l_returnflag",
                              exact = true)

  /** A2+A3+A4 fused: mean/max/min-of-means in one shuffle. */
  def bandStatsFlagship(s: SparkSession, dir: String): DataFrame =
    BandStats.bandStats(orderDiscountMeans(s, dir), "l_returnflag",
                        exact = true)

  /** A3: max-of-means alone (`band_max_computation.cpp`). */
  def bandMaxOfMeans(s: SparkSession, dir: String): DataFrame =
    BandStats.bandMaxOfMeans(orderDiscountMeans(s, dir), "l_returnflag",
                             exact = true)

  /** A4: min-of-means alone — intended (non-buggy) semantics of
    * `band_min_computation.cpp` (SURVEY §2.4). */
  def bandMinOfMeans(s: SparkSession, dir: String): DataFrame =
    BandStats.bandMinOfMeans(orderDiscountMeans(s, dir), "l_returnflag",
                             exact = true)

  /** A1 keep-empty variant: groups whose every value is nodata survive
    * with mean 0.0 (the reference's ternary at
    * band_mean_computation.cpp:45). Values <= 100 are mapped to the
    * nodata sentinel so whole groups actually become empty. */
  def bandFileMeansKeepEmpty(s: SparkSession, dir: String): DataFrame = {
    val shifted = Tables.events(s, dir)
      .withColumn("v", when(col("value") > 100, col("value")).otherwise(lit(0.0)))
    BandStats.bandFileMeansKeepEmpty(shifted, "user_id", "event_type", "v",
                                     exact = true)
  }

  /** Pixel-weighted global mean (single-level) — the correctness foil to
    * mean-of-means. */
  def bandWeightedMean(s: SparkSession, dir: String): DataFrame =
    BandStats.bandWeightedMean(Tables.events(s, dir), "event_type", "value",
                               exact = true)

  /** P3+S3: composite pivot — three chosen event types recombined into
    * per-user (r,g,b)-style columns. Raw max, no arithmetic, so doubles
    * compare exactly. */
  def compositePivot(s: SparkSession, dir: String): DataFrame =
    Composite.pivotBands(Tables.events(s, dir), Seq("user_id"), "event_type",
                         "value",
                         Seq("purchase" -> "r", "click" -> "g", "view" -> "b"))

  // ---------------------------------------------------------------- registry

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "band_file_means"            -> (bandFileMeans _),
    "band_mean_of_means"         -> (bandMeanOfMeans _),
    "band_max_of_means"          -> (bandMaxOfMeans _),
    "band_min_of_means"          -> (bandMinOfMeans _),
    "band_stats"                 -> (bandStatsFlagship _),
    "band_file_means_keep_empty" -> (bandFileMeansKeepEmpty _),
    "band_weighted_mean"         -> (bandWeightedMean _),
    "composite_pivot"            -> (compositePivot _),
  )

  val oracles: Map[String, String] = Map(
    "band_file_means" ->
      s"""SELECT user_id, event_type, ${sqlAvg("value")} AS mean_value,
         |COUNT(value) AS n_valid FROM events WHERE value <> 0
         |GROUP BY user_id, event_type""".stripMargin,
    "band_mean_of_means" ->
      s"""SELECT l_returnflag,
         |CAST(SUM(mean_value) AS DOUBLE) / COUNT(*) AS mean_of_means,
         |CAST(SUM(mean_value) AS DOUBLE) / COUNT(*) AS sum_over_count,
         |COUNT(*) AS n_files FROM ($orderDiscountMeansSql) GROUP BY l_returnflag""".stripMargin,
    "band_max_of_means" ->
      s"""SELECT l_returnflag, CAST(MAX(mean_value) AS DOUBLE) AS max_of_means
         |FROM ($orderDiscountMeansSql) GROUP BY l_returnflag""".stripMargin,
    "band_min_of_means" ->
      s"""SELECT l_returnflag, CAST(MIN(mean_value) AS DOUBLE) AS min_of_means
         |FROM ($orderDiscountMeansSql) GROUP BY l_returnflag""".stripMargin,
    "band_stats" ->
      s"""SELECT l_returnflag,
         |CAST(SUM(mean_value) AS DOUBLE) / COUNT(*) AS mean_of_means,
         |CAST(MAX(mean_value) AS DOUBLE) AS max_of_means,
         |CAST(MIN(mean_value) AS DOUBLE) AS min_of_means,
         |COUNT(*) AS n_files FROM ($orderDiscountMeansSql) GROUP BY l_returnflag""".stripMargin,
    "band_file_means_keep_empty" ->
      s"""SELECT user_id, event_type,
         |COALESCE(${sqlAvg("CASE WHEN v <> 0 THEN v END")}, 0.0) AS mean_value,
         |COUNT(CASE WHEN v <> 0 THEN v END) AS n_valid
         |FROM (SELECT user_id, event_type,
         |        CASE WHEN value > 100 THEN value ELSE 0.0 END AS v FROM events)
         |GROUP BY user_id, event_type""".stripMargin,
    "band_weighted_mean" ->
      s"""SELECT event_type, ${sqlAvg("value")} AS weighted_mean,
         |COUNT(value) AS n_pixels FROM events WHERE value <> 0
         |GROUP BY event_type""".stripMargin,
    "composite_pivot" ->
      s"""SELECT user_id,
         |MAX(CASE WHEN event_type = 'purchase' THEN value END) AS r,
         |MAX(CASE WHEN event_type = 'click' THEN value END) AS g,
         |MAX(CASE WHEN event_type = 'view' THEN value END) AS b
         |FROM events WHERE event_type IN ('purchase', 'click', 'view')
         |GROUP BY user_id""".stripMargin,
  )
}
