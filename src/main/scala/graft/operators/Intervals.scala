package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join as an equi-shuffle.
  *
  * The naive plan for `l.start <= r.end AND r.start <= l.end` is a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast of a
  * whole side; at 100 TB it is the single worst plan Spark can emit.
  * Binning makes it an equi join: each interval explodes to the fixed
  * time bins it covers, the join key is (partition keys, bin), and a
  * pair is emitted exactly once — in the bin containing the later of the
  * two starts — so no post-join `distinct` (and its extra shuffle) is
  * needed. Overlapping pairs co-occur in that bin by construction
  * (overlap ⇒ max(start) ≤ min(end), so the bin of max(start) lies in
  * both intervals' bin ranges).
  *
  * Cost: |rows| × (interval span / binWidth) exploded rows shuffle; pick
  * `binWidth` near the typical interval length so the blow-up factor
  * stays ~1-2×. Long-tail intervals fatten their own fan-out only
  * (no cross-row skew); a degenerate all-day interval is the salting
  * candidate, not the common case.
  */
object Intervals {

  /** Overlap-join two interval sets on `keyCols` + time-bin. Bounds are
    * epoch-µs LONG columns named by the caller; both ends inclusive.
    * Emits one row per overlapping pair with both sides' payloads. */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  startCol: String, endCol: String,
                  binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, "binWidthUs must be positive")
    def binned(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (keyCols.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
      }
      // integer DIV, not `/` (double division would round 15-digit µs
      // quotients at bin boundaries)
      renamed.withColumn("bin",
        explode(sequence(expr(s"$prefix$startCol DIV $binWidthUs"),
                         expr(s"$prefix$endCol DIV $binWidthUs"))))
    }
    val l = binned(left, "l_")
    val r = binned(right, "r_")
    val ls = col(s"l_$startCol"); val le = col(s"l_$endCol")
    val rs = col(s"r_$startCol"); val re = col(s"r_$endCol")
    l.join(r, keyCols :+ "bin")
      .filter(ls <= re && rs <= le &&
              col("bin") === expr(
                s"greatest(l_$startCol, r_$startCol) DIV $binWidthUs"))
      .drop("bin")
  }
}
