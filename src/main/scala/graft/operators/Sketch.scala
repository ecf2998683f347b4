package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the fixed-memory heavy-hitter
  * primitive a training-data pipeline reaches for when exact per-token
  * counts stop fitting. Hash family is seeded md5 (no RNG), the same
  * constants the DuckDB oracle replays, so estimates are deterministic
  * and cross-engine hash-exact.
  *
  * Scale shape: building the sketch is ONE shuffle whose exchange
  * carries at most depth×width rows per map partition (hash aggregation
  * pre-combines inside the scan task). The sketch size is independent
  * of the corpus: an exact token count at 100 TB shuffles one row per
  * DISTINCT token (billions), the CMS always shuffles depth×width
  * cells. Estimates never underestimate; overestimate is ≤ e/width·N
  * with probability 1−e^(−depth) per probe (Cormode & Muthukrishnan,
  * J. Algorithms 2005).
  */
object Sketch {

  /** Row-r bucket for a key: first 8 hex digits of md5("r|key") mod
    * width — non-negative, so Spark `%` and DuckDB `%` agree. */
  def cmsBucket(row: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit("|"), key)), 1, 8),
         16, 10).cast("long") % width

  private def rowIds(depth: Int): Column =
    explode(array((0 until depth).map(lit): _*))

  /** The sketch itself: (r, bucket, cell_n) cell counts, ≤ depth·width
    * rows regardless of input size. */
  def cmsBuild(keys: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol), rowIds(depth).as("r"))
      .groupBy(col("r"), cmsBucket(col("r"), col(keyCol), width).as("bucket"))
      .agg(count(lit(1)).as("cell_n"))

  /** Second-moment (F2 = Σ_key count²) estimate by the AMS tug-of-war
    * sketch: per row, bucket cells accumulate signed counts and
    * Σ cell² estimates F2 unbiasedly; the lower median over rows
    * concentrates it (variance ~2·F2²/width per row). F2/n² is the
    * key-skew signal — the quantity behind the salt-or-not decision —
    * computed in one bounded-exchange pass (≤ depth×width cells)
    * where the exact form shuffles every distinct key. All integer,
    * deterministic hash family → oracle-exact.
    *
    * Bucket and sign both come from ONE md5 per (row, key) — hex
    * digits 1-8 route the bucket (identical layout to [[cmsBucket]]),
    * digit 9's parity is the tug-of-war sign. Halves the hash work of
    * the earlier two-digest family; the digest's bits are independent
    * across digit positions, which is all the sign needs. */
  def amsF2(keys: DataFrame, keyCol: String,
            depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol).as("k"), rowIds(depth).as("r"))
      .withColumn("m", md5(concat(col("r").cast("string"), lit("|"), col("k"))))
      .groupBy(col("r"),
               (conv(substring(col("m"), 1, 8), 16, 10).cast("long") % width)
                 .as("bucket"))
      .agg(sum(when(conv(substring(col("m"), 9, 1), 16, 10)
                      .cast("int") % 2 === 0, 1L).otherwise(-1L)).as("cell"))
      .groupBy(col("r")).agg(sum(col("cell") * col("cell")).as("est_r"))
      // get(), not getItem(): ANSI mode throws INVALID_ARRAY_INDEX on
      // the empty collected array (degenerate empty input) where get()
      // returns NULL
      .agg(get(sort_array(collect_list(col("est_r"))), lit(depth / 2 - 1))
             .as("est_f2"))

  /** Union of independently-built sketches by cell-wise sum — CMS is a
    * linear sketch, so `merge(build(A), build(B)) == build(A ∪ B)`
    * exactly (spec-pinned). This is the property that makes the sketch
    * distributed-friendly: shards/streams/partitions sketch locally and
    * merge in one tiny aggregation, no re-scan of the raw data. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cell_n")).as("cell_n"))

  /** Point estimates for every row of `probes`: min over the sketch's
    * depth rows of the probed cell, appended as `cms_n`. The sketch is
    * tiny by construction → broadcast; missing cells (key never counted)
    * estimate 0. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probeCols = probes.columns.toSeq.map(col)
    probes.select(col("*"), rowIds(depth).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col(keyCol), width))
      .join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("cell_n"), lit(0L))).as("cms_n"))
  }
}
