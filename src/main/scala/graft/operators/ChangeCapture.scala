package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch change-data-capture: snapshot diff → MERGE actions → slowly
  * changing dimension (type 2) history.
  *
  * The reference engine has no mutation surface at all (SURVEY §2 —
  * append-only computation); every lakehouse deployment of this engine
  * needs one. These are the batch halves of MERGE INTO: a full-outer
  * key diff classifying each key as INSERT / UPDATE / DELETE / NOOP,
  * and the SCD2 fold that turns those actions into a versioned history
  * with `valid_from` / `valid_to` / `is_current`.
  *
  * Scale: one shuffle each, on the merge key — exactly the shuffle
  * MERGE INTO performs. The diff is a full outer join (sort-merge for
  * fact-sized sides, broadcast when staged is a trickle); the SCD2 fold
  * is a union of narrow projections over the classified diff, no second
  * shuffle. Nothing is collected; the action split is a column, not a
  * driver-side branch.
  */
object ChangeCapture {

  val ActionCol = "cdc_action"

  /** Classify `staged` against `current` by `keyCol`: every key present
    * in exactly one side is an INSERT (staged only) or DELETE (current
    * only); keys in both are UPDATE when any of `compareCols` differ
    * (null-safe) and NOOP otherwise. Output carries both sides' compare
    * columns as `cur_*` / `new_*` plus the key and [[ActionCol]]. */
  def mergeActions(current: DataFrame, staged: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "mergeActions needs ≥ 1 compare column")
    for ((df, side) <- Seq(current -> "current", staged -> "staged");
         c <- keyCol +: compareCols)
      require(df.columns.contains(c), s"$side side is missing column '$c' " +
        s"(has: ${df.columns.mkString(", ")})")
    val cur = current.select(
      col(keyCol) +: lit(true).as("cur_present") +:
        compareCols.map(c => col(c).as(s"cur_$c")): _*)
    val stg = staged.select(
      col(keyCol) +: lit(true).as("new_present") +:
        compareCols.map(c => col(c).as(s"new_$c")): _*)
    val joined = cur.join(stg, Seq(keyCol), "full_outer")
    // explicit presence markers — all-null compare columns on one side
    // must not read as absence (the coalesced key itself is never null)
    val inCur = coalesce(col("cur_present"), lit(false))
    val inStg = coalesce(col("new_present"), lit(false))
    val changed = compareCols
      .map(c => !(col(s"cur_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined.withColumn(ActionCol,
      when(!inCur, lit("INSERT"))
        .when(!inStg, lit("DELETE"))
        .when(changed, lit("UPDATE"))
        .otherwise(lit("NOOP")))
      .drop("cur_present", "new_present")
  }

  /** Fold classified merge actions into an SCD2 history:
    *
    *  - NOOP    → one open row with the current values (original
    *              `validFromCol` preserved).
    *  - UPDATE  → a closed row (old values, `valid_to = batchTs`) plus
    *              an open row (new values, `valid_from = batchTs`).
    *  - DELETE  → a closed row only.
    *  - INSERT  → an open row (`valid_from = batchTs`).
    *
    * `actions` must be [[mergeActions]] output; `valueCols` are the
    * tracked attributes (without the `cur_`/`new_` prefix); the caller
    * supplies the original valid-from as a `cur_`-side column name.
    * Open rows have `valid_to IS NULL` and `is_current = true`. */
  def scd2Apply(actions: DataFrame, keyCol: String, valueCols: Seq[String],
                validFromCol: String, batchTs: Column): DataFrame = {
    def side(prefix: String, from: Column, to: Column, open: Boolean) =
      actions.select(
        col(keyCol) +: valueCols.map(c => col(s"$prefix$c").as(c)) :+
          from.as("valid_from") :+ to.as("valid_to") :+
          lit(open).as("is_current") :+ col(ActionCol): _*)
    val a = col(ActionCol)
    val origFrom = col(s"cur_$validFromCol").cast("timestamp")
    val closed = side("cur_", origFrom, batchTs, open = false)
      .filter(a === "UPDATE" || a === "DELETE")
    val opened = side("new_", batchTs, lit(null).cast("timestamp"), open = true)
      .filter(a === "UPDATE" || a === "INSERT")
    val kept = side("cur_", origFrom, lit(null).cast("timestamp"), open = true)
      .filter(a === "NOOP")
    closed.unionByName(opened).unionByName(kept).drop(ActionCol)
  }

  /** Incremental view maintenance for SUM/COUNT group-by aggregates:
    * turn classified merge actions into per-group DELTAS and fold them
    * into the existing aggregate — the 100 TB move that maintains a
    * materialized aggregate from a trickle of changes instead of
    * re-scanning the base table.
    *
    * Each action contributes up to two delta rows — a retraction from
    * the OLD group (DELETE/UPDATE) and an addition to the NEW group
    * (INSERT/UPDATE) — so updates that MOVE a row across groups are
    * handled, not just in-place value changes. `valueCol` is summed in
    * exact decimal ([[graft.queries.Canon.InputDec]]) so the folded
    * result is bit-identical to a full recompute.
    *
    * Shuffle: one aggregation over the (small) action set on the group
    * key + a join with the (group-cardinality-sized) base aggregate.
    * The base table is never touched. */
  def incrementalSumCount(actions: DataFrame, base: DataFrame,
                          groupCol: String, valueCol: String,
                          nCol: String = "n_rows",
                          sumCol: String = "sum_dec"): DataFrame = {
    // Loud contract checks: `actions` must be mergeActions output carrying
    // both sides of the group/value columns; `base` must be the maintained
    // aggregate. A missing column would otherwise surface as a Catalyst
    // UNRESOLVED_COLUMN naming an internal cur_/new_ alias.
    for (c <- Seq(ActionCol, s"cur_$groupCol", s"new_$groupCol",
                  s"cur_$valueCol", s"new_$valueCol"))
      require(actions.columns.contains(c),
        s"actions is not mergeActions output: missing '$c'")
    for (c <- Seq(groupCol, nCol, sumCol))
      require(base.columns.contains(c), s"base aggregate is missing '$c'")
    val a = col(ActionCol)
    val dec = graft.queries.Canon.dec _
    val retract = actions.filter(a === "DELETE" || a === "UPDATE")
      .select(col(s"cur_$groupCol").as(groupCol),
              lit(-1L).as("dn"),
              (dec(col(s"cur_$valueCol")) * -1).as("dv"))
    val add = actions.filter(a === "INSERT" || a === "UPDATE")
      .select(col(s"new_$groupCol").as(groupCol),
              lit(1L).as("dn"),
              dec(col(s"new_$valueCol")).as("dv"))
    val delta = retract.unionByName(add)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    base.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
              (coalesce(col(nCol), lit(0L)) + coalesce(col("dn"), lit(0L)))
                .as(nCol),
              (coalesce(col(sumCol), lit(0).cast(graft.queries.Canon.InputDec)) +
               coalesce(col("dv"), lit(0).cast(graft.queries.Canon.InputDec)))
                .as(sumCol))
      .filter(col(nCol) > 0)
  }
}
