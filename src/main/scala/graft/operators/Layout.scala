package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. Sorting by the interleaved-bit
  * key makes row groups simultaneously narrow in BOTH dimensions, so
  * min/max footer stats prune scans for predicates on either column;
  * a single-column sort gives perfect pruning on one dimension and
  * none on the other.
  *
  * Key law (relied on by the spec and the locality audit): with even
  * bit-interleaving, an aligned z-range `[k·4^b, (k+1)·4^b)` is exactly
  * an aligned `2^b × 2^b` rectangle in (a, b) space — bounded spread in
  * both dimensions by construction.
  *
  * Determinism: pure integer bit arithmetic, bit-identical in any
  * engine; the DuckDB oracle SQL is GENERATED from the same constants
  * via [[Layout.zorderSqlExpr]].
  */
object Layout {

  /** Bits kept per dimension (32-bit z-keys from two 16-bit values). */
  val ZBits = 16

  /** Dimension value reduced to the z-grid: low [[ZBits]] bits. */
  def zmod(c: Column): Column = pmod(c.cast("long"), lit(1L << ZBits))

  /** 2-D Morton key: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. */
  def zorderKey(a: Column, b: Column): Column = {
    val am = zmod(a)
    val bm = zmod(b)
    (0 until ZBits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** SQL twin of [[zorderKey]] over pre-modded operand expressions —
    * single source for the oracle. */
  def zorderSqlExpr(a: String, b: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(s"(((($a) >> $i) & 1) << ${2 * i})",
          s"(((($b) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Cluster a DataFrame into `numFiles` z-ordered splits: range
    * partition on the z-key (contiguous, disjoint key ranges per file)
    * then sort within each. The write path for a z-ordered table —
    * at 100 TB this replaces a full global sort with a sampled range
    * exchange + per-partition sorts. */
  def clusterByZ(df: DataFrame, a: Column, b: Column,
                 numFiles: Int): DataFrame = {
    val withKey = df.withColumn("__zkey", zorderKey(a, b))
    withKey.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
