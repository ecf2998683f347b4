package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The reference's entire statistical surface, generalized.
  *
  * The reference computes a two-level aggregation over rasters
  * (`band_mean_computation.cpp:11-50,143-158` and the max/min twins):
  *
  *   level 1: per-(file, band) MEAN over pixels with value != 0 (nodata)
  *   level 2: per-band {MEAN | MAX | MIN} over the level-1 means
  *
  * Both levels are plain Catalyst aggregates over arbitrary key columns —
  * `(file, band)` in raster terms, any fixture key pair in the oracle
  * harness. Catalyst runs each `groupBy.agg` as a partial (map-side) +
  * final (post-shuffle) `HashAggregateExec` pair, which is exactly the
  * reference's local-fold + `MPI_Reduce` shape
  * (`band_mean_computation.cpp:143-153`) — but dynamic, spill-safe, and
  * whole-stage-codegen'd. No UDAF is needed anywhere. The only shuffle is
  * on the level-1 group key; level 2 runs over the (much smaller) level-1
  * output, so at 100 TB the cost is one hash-partitioned exchange of
  * partial aggregates, not of raw pixels.
  *
  * == The `exact` flag ==
  * Default (`exact = false`): plain double `avg` — fastest, whole-stage
  * codegen, what production runs. `exact = true`: means are computed as
  * exact DECIMAL(18,4) sums divided (in IEEE double) by the count. Because
  * the fixture inputs are exact ≤4-decimal values, the decimal sum is
  * order-independent and *bit-identical* across engines, which is what the
  * DuckDB-oracle hash compare requires (SURVEY §7.4: double summation
  * order differs between Spark's partial aggregation and DuckDB). Level-1
  * means that feed level 2 are additionally quantized to DECIMAL(18,6) so
  * the level-2 sum is again exact. Decimal sums are still distributive —
  * the partial/final split and shuffle shape are identical to the double
  * path.
  *
  * Deliberate semantic decisions vs the reference (SURVEY.md §2.4):
  *  - min/max use true fold semantics, not the reference's buggy 0.0-init
  *    clamp (`band_min_computation.cpp:143`) or the p2p merge bugs.
  *  - a group with only nodata pixels yields mean 0.0 (matching
  *    `band_mean_computation.cpp:45`'s ternary) via `coalesce` in
  *    [[bandFileMeansKeepEmpty]]; the plain form drops such groups.
  *  - `bandMeanOfMeans` divides by the number of groups *present* (files
  *    that produced a stats row), the only well-defined form once
  *    zeros-on-error rows (`band_mean_computation.cpp:13-16`) are dropped.
  */
object BandStats {
  /** Exact container for the fixtures' ≤4-decimal-place doubles. */
  private val InputDec = DecimalType(18, 4)
  /** Quantization applied to level-1 means feeding level 2 in exact mode. */
  private val MeanDec = DecimalType(18, 6)

  private def meanAgg(value: Column, exact: Boolean): Column =
    if (exact) sum(value.cast(InputDec)).cast(DoubleType) / count(value)
    else avg(value)

  /** Level 1: per-(file, band) mean of non-nodata values.
    * `filter(v != 0) → groupBy(file, band) → avg` — the Spark form of
    * `calculate_band_means` (`band_mean_computation.cpp:11-50`).
    */
  def bandFileMeans(df: DataFrame, fileCol: String, bandCol: String,
                    valueCol: String, nodata: Double = 0.0,
                    exact: Boolean = false): DataFrame =
    df.filter(col(valueCol) =!= lit(nodata))
      .groupBy(col(fileCol), col(bandCol))
      .agg(meanAgg(col(valueCol), exact).as("mean_value"),
           count(col(valueCol)).as("n_valid"))

  /** Level 1 with the mean quantized to DECIMAL(18,6) — use as input to
    * the level-2 rollups in exact mode so their sums are exact. */
  def bandFileMeansQuantized(df: DataFrame, fileCol: String, bandCol: String,
                             valueCol: String, nodata: Double = 0.0): DataFrame =
    df.filter(col(valueCol) =!= lit(nodata))
      .groupBy(col(fileCol), col(bandCol))
      .agg(meanAgg(col(valueCol), exact = true).cast(MeanDec).as("mean_value"))

  /** Level 1 keeping all-nodata groups as mean 0.0 — the exact contract of
    * `band_mean_computation.cpp:45` (`count > 0 ? sum/count : 0.0`).
    * Conditional aggregation instead of a pre-filter so empty groups
    * survive with a defined value.
    */
  def bandFileMeansKeepEmpty(df: DataFrame, fileCol: String, bandCol: String,
                             valueCol: String, nodata: Double = 0.0,
                             exact: Boolean = false): DataFrame = {
    val valid = when(col(valueCol) =!= lit(nodata), col(valueCol))
    df.groupBy(col(fileCol), col(bandCol))
      .agg(coalesce(meanAgg(valid, exact), lit(0.0)).as("mean_value"),
           count(valid).as("n_valid"))
  }

  /** Exact level-2 arithmetic quantizes its input to DECIMAL(18,6)
    * itself (identity when level 1 already quantized): per-group casts
    * are order-independent, decimal sums are exact, so the rollup is
    * invariant under repartitioning even over a double-typed level 1 —
    * the property spec's process-count axis. */
  private def l2Mean(exact: Boolean): Column =
    if (exact) sum(col("mean_value").cast(MeanDec)).cast(DoubleType) / count(lit(1))
    else avg(col("mean_value"))
  private def l2Extreme(f: Column => Column, exact: Boolean): Column =
    if (exact) f(col("mean_value").cast(MeanDec)).cast(DoubleType)
    else f(col("mean_value"))

  /** Level 2: per-band mean of the level-1 means — the collective-mean
    * program (`band_mean_computation.cpp:143-158`, `MPI_SUM` then
    * `/ total_files`); over present groups sum(mean)/count(*) ≡
    * avg(mean), which is what l2Mean computes. */
  def bandMeanOfMeans(level1: DataFrame, bandCol: String,
                      exact: Boolean = false): DataFrame =
    level1.groupBy(col(bandCol)).agg(
      l2Mean(exact).as("mean_of_means"),
      count(lit(1)).as("n_files"))

  /** Level 2 max — `band_max_computation.cpp:143-153` with true-fold
    * semantics (no 0.0 floor). */
  def bandMaxOfMeans(level1: DataFrame, bandCol: String,
                     exact: Boolean = false): DataFrame =
    level1.groupBy(col(bandCol)).agg(l2Extreme(max, exact).as("max_of_means"))

  /** Level 2 min — intended semantics of `band_min_computation.cpp`
    * (the reference's 0.0-init makes it a constant-0 bug; SURVEY §2.4). */
  def bandMinOfMeans(level1: DataFrame, bandCol: String,
                     exact: Boolean = false): DataFrame =
    level1.groupBy(col(bandCol)).agg(l2Extreme(min, exact).as("min_of_means"))

  /** All three level-2 stats in one pass (one shuffle, not three). */
  def bandStats(level1: DataFrame, bandCol: String,
                exact: Boolean = false): DataFrame =
    level1.groupBy(col(bandCol)).agg(
      l2Mean(exact).as("mean_of_means"),
      l2Extreme(max, exact).as("max_of_means"),
      l2Extreme(min, exact).as("min_of_means"),
      count(lit(1)).as("n_files"))

  /** Pixel-weighted global mean per band — the statistically-correct
    * alternative to mean-of-means (a single-level aggregate the reference
    * never computes but implies; SURVEY §7.2 item 4). One shuffle on
    * `band` only.
    */
  def bandWeightedMean(df: DataFrame, bandCol: String, valueCol: String,
                       nodata: Double = 0.0, exact: Boolean = false): DataFrame =
    df.filter(col(valueCol) =!= lit(nodata))
      .groupBy(col(bandCol))
      .agg(meanAgg(col(valueCol), exact).as("weighted_mean"),
           count(col(valueCol)).as("n_pixels"))
}

/** Typed rows for the Dataset façade — top-level on purpose: case
  * classes nested inside an object silently break whole-stage codegen
  * (interpreted encoder fallback, see build notes). */
case class Pixel(file: String, band: Int, value: Double)
case class BandFileStats(file: String, band: Int,
                         mean_value: Double, n_valid: Long)
case class BandSummary(band: Int, mean_of_means: Double,
                       max_of_means: Double, min_of_means: Double,
                       n_files: Long)

/** `Dataset[T]` façade over [[BandStats]] for callers that want
  * compile-time row types: same Catalyst plans (the typed wrapper is a
  * schema assertion via `.as[T]`, not a different execution path), so
  * pushdown/codegen behavior is identical to the DataFrame API. */
object BandStatsTyped {
  def bandFileMeans(px: Dataset[Pixel], nodata: Double = 0.0,
                    exact: Boolean = false): Dataset[BandFileStats] = {
    implicit val enc: Encoder[BandFileStats] = Encoders.product[BandFileStats]
    BandStats.bandFileMeans(px.toDF(), "file", "band", "value", nodata, exact)
      .as[BandFileStats]
  }

  def bandStats(level1: Dataset[BandFileStats]): Dataset[BandSummary] = {
    implicit val enc: Encoder[BandSummary] = Encoders.product[BandSummary]
    BandStats.bandStats(level1.toDF(), "band").as[BandSummary]
  }
}
