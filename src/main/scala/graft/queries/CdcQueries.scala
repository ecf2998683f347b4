package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ChangeCapture
import graft.sources.Tables
import Canon._

/** Change-data-capture suite: snapshot diff → MERGE action classes →
  * SCD2 history, over a staged orders snapshot derived DETERMINISTICALLY
  * from the fixture (pure modular arithmetic on o_orderkey — the oracle
  * replays the same derivation in SQL, so the whole
  * diff→classify→version pipeline is hash-checked end to end):
  *
  *  - keys ≡ 5 (mod 17) are absent from the staged snapshot → DELETE
  *  - keys ≡ 3 (mod 10) arrive with totalprice+100 and status 'U' → UPDATE
  *  - keys ≡ 7 (mod 23) also arrive cloned as a NEW key (+10^9),
  *    order date shifted +30 days → INSERT
  *  - everything else arrives unchanged → NOOP
  *
  * (The classes overlap pairwise — a key can be deleted AND spawn an
  * insert clone — which exercises the classifier's independence.)
  */
object CdcQueries {

  private val NewKeyOffset = 1000000000L

  /** The staged snapshot: current minus deletes, with updates applied,
    * plus insert clones. Pure column arithmetic — no RNG, no driver. */
  private def staged(s: SparkSession, dir: String): DataFrame = {
    val cur = Tables.orders(s, dir)
    val surviving = cur.filter(col("o_orderkey") % 17 =!= 5)
    val mutated = surviving
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 3, col("o_totalprice") + 100.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 10 === 3, lit("U"))
          .otherwise(col("o_orderstatus")))
    val inserts = cur.filter(col("o_orderkey") % 23 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + NewKeyOffset)
      .withColumn("o_orderdate",
        (col("o_orderdate").cast("date") + expr("INTERVAL 30 DAYS"))
          .cast("timestamp"))
    mutated.unionByName(inserts)
  }

  private val CompareCols =
    Seq("o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** MERGE-action audit: row and price volume per action class. The
    * full-outer diff shuffles each side once on the merge key; the audit
    * is a 4-row aggregate over the classified output. */
  def cdcMergeActions(s: SparkSession, dir: String): DataFrame =
    ChangeCapture
      .mergeActions(Tables.orders(s, dir), staged(s, dir), "o_orderkey",
                    CompareCols)
      .groupBy(col(ChangeCapture.ActionCol).as("action"))
      .agg(count(lit(1)).as("n_rows"),
           exactSum(coalesce(col("new_o_totalprice"), col("cur_o_totalprice")))
             .as("sum_price"))

  /** SCD2 fold summary: the versioned history's row counts and price
    * volume per (priority, is_current) — closed UPDATE/DELETE rows carry
    * their original order date as valid_from and the batch timestamp as
    * valid_to; opened rows start at the batch timestamp. The day-span
    * sum pins the valid_from/valid_to arithmetic, not just row counts. */
  def cdcScd2Summary(s: SparkSession, dir: String): DataFrame = {
    val batchTs = lit("2002-01-01 00:00:00").cast("timestamp")
    val actions = ChangeCapture.mergeActions(
      Tables.orders(s, dir), staged(s, dir), "o_orderkey", CompareCols)
    val hist = ChangeCapture.scd2Apply(
      actions, "o_orderkey", CompareCols, "o_orderdate", batchTs)
    hist.groupBy(col("o_orderpriority"), col("is_current"))
      .agg(count(lit(1)).as("n_rows"),
           exactSum(col("o_totalprice")).as("sum_price"),
           sum(datediff(coalesce(col("valid_to"), col("valid_from")),
                        col("valid_from"))).as("sum_closed_days"))
  }

  /** Incremental view maintenance: the per-priority (count, sum) aggregate
    * of the CURRENT snapshot folded forward with action deltas — proven
    * ≡ a full recompute over the staged snapshot, because that full
    * recompute IS the oracle. The base table is scanned once for the
    * base aggregate; the maintenance pass touches only the change set. */
  def cdcIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val cur = Tables.orders(s, dir)
    val base = cur.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
           sum(Canon.dec(col("o_totalprice"))).as("sum_dec"))
    val actions = ChangeCapture.mergeActions(
      cur, staged(s, dir), "o_orderkey", CompareCols)
    ChangeCapture
      .incrementalSumCount(actions, base, "o_orderpriority", "o_totalprice")
      .select(col("o_orderpriority"), col("n_rows"),
              col("sum_dec").cast(org.apache.spark.sql.types.DoubleType)
                .as("sum_price"))
  }

  /** Point-in-time (as-of) lookup against the SCD2 history: the version
    * set valid at two probe instants — one BEFORE the batch (rows valid
    * from their order date; later orders don't exist yet) and one AFTER
    * (the post-merge current state, deletes gone, updates at new
    * values). A row is valid at T iff valid_from ≤ T < valid_to (open
    * end = ∞). This is the dimension-lookup join every fact pipeline
    * runs against a versioned dimension; the filter is a pure map over
    * the history (no extra shuffle beyond the summary's group-by). */
  def cdcAsof(s: SparkSession, dir: String): DataFrame = {
    val batchTs = lit("2002-01-01 00:00:00").cast("timestamp")
    val actions = ChangeCapture.mergeActions(
      Tables.orders(s, dir), staged(s, dir), "o_orderkey", CompareCols)
    val hist = ChangeCapture.scd2Apply(
      actions, "o_orderkey", CompareCols, "o_orderdate", batchTs)
    def at(label: String, t: String): DataFrame =
      hist.filter(col("valid_from") <= lit(t).cast("timestamp") &&
                  (col("valid_to").isNull ||
                   col("valid_to") > lit(t).cast("timestamp")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
             exactSum(col("o_totalprice")).as("sum_price"))
        .select(lit(label).as("epoch"), col("o_orderpriority"),
                col("n_rows"), col("sum_price"))
    at("before_batch", "2001-06-15 00:00:00")
      .unionByName(at("after_batch", "2002-02-01 00:00:00"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_cdc_merge_actions" -> (cdcMergeActions _),
    "rel_cdc_scd2"          -> (cdcScd2Summary _),
    "rel_cdc_incr_agg"      -> (cdcIncrementalAgg _),
    "rel_cdc_asof"          -> (cdcAsof _),
  )

  // Oracle twins replay the staged-snapshot derivation in SQL. DuckDB
  // integer % matches Spark's for the non-negative fixture keys.
  private val stagedSql =
    s"""staged AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 10 = 3 THEN 'U' ELSE o_orderstatus END
       |      AS o_orderstatus,
       |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 100.0
       |      ELSE o_totalprice END AS o_totalprice,
       |    o_orderdate, o_orderpriority
       |  FROM orders WHERE o_orderkey % 17 <> 5
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice,
       |    o_orderdate + INTERVAL 30 DAY, o_orderpriority
       |  FROM orders WHERE o_orderkey % 23 = 7),
       |diff AS (
       |  SELECT
       |    COALESCE(c.o_orderkey, s.o_orderkey) AS k,
       |    c.o_orderkey IS NOT NULL AS in_cur,
       |    s.o_orderkey IS NOT NULL AS in_stg,
       |    c.o_orderstatus AS cur_status, s.o_orderstatus AS new_status,
       |    c.o_totalprice AS cur_price, s.o_totalprice AS new_price,
       |    c.o_orderdate AS cur_date, s.o_orderdate AS new_date,
       |    c.o_orderpriority AS cur_prio, s.o_orderpriority AS new_prio
       |  FROM orders c FULL OUTER JOIN staged s
       |    ON c.o_orderkey = s.o_orderkey),
       |classified AS (
       |  SELECT *,
       |    CASE WHEN NOT in_cur THEN 'INSERT'
       |         WHEN NOT in_stg THEN 'DELETE'
       |         WHEN cur_status IS DISTINCT FROM new_status
       |           OR cur_price IS DISTINCT FROM new_price
       |           OR cur_date IS DISTINCT FROM new_date
       |           OR cur_prio IS DISTINCT FROM new_prio THEN 'UPDATE'
       |         ELSE 'NOOP' END AS action
       |  FROM diff)""".stripMargin

  /** Shared SCD2-history CTE (staged → diff → classified → hist) for the
    * scd2 / as-of oracles. */
  private val histSql =
    s"""$stagedSql,
       |hist AS (
       |  SELECT cur_prio AS o_orderpriority, cur_price AS p,
       |    cur_date AS valid_from,
       |    TIMESTAMP '2002-01-01' AS valid_to, FALSE AS is_current
       |  FROM classified WHERE action IN ('UPDATE', 'DELETE')
       |  UNION ALL
       |  SELECT new_prio, new_price,
       |    TIMESTAMP '2002-01-01', NULL, TRUE
       |  FROM classified WHERE action IN ('UPDATE', 'INSERT')
       |  UNION ALL
       |  SELECT cur_prio, cur_price, cur_date, NULL, TRUE
       |  FROM classified WHERE action = 'NOOP')""".stripMargin

  val oracles: Map[String, String] = Map(
    "rel_cdc_merge_actions" ->
      s"""WITH $stagedSql
         |SELECT action, COUNT(*) AS n_rows,
         |${sqlToDouble(s"SUM(${sqlDec("COALESCE(new_price, cur_price)")})")}
         |  AS sum_price
         |FROM classified GROUP BY 1""".stripMargin,
    "rel_cdc_scd2" ->
      s"""WITH $histSql
         |SELECT o_orderpriority, is_current, COUNT(*) AS n_rows,
         |${sqlToDouble(s"SUM(${sqlDec("p")})")} AS sum_price,
         |CAST(SUM(date_diff('day', valid_from,
         |  COALESCE(valid_to, valid_from))) AS BIGINT) AS sum_closed_days
         |FROM hist GROUP BY 1, 2""".stripMargin,
    "rel_cdc_asof" ->
      s"""WITH $histSql,
         |epochs(epoch, t) AS (VALUES
         |  ('before_batch', TIMESTAMP '2001-06-15'),
         |  ('after_batch', TIMESTAMP '2002-02-01'))
         |SELECT epoch, o_orderpriority, COUNT(*) AS n_rows,
         |${sqlToDouble(s"SUM(${sqlDec("p")})")} AS sum_price
         |FROM epochs JOIN hist
         |  ON valid_from <= t AND (valid_to IS NULL OR valid_to > t)
         |GROUP BY 1, 2""".stripMargin,
    // the oracle IS the full recompute the incremental path avoids —
    // hash equality proves the IVM fold correct
    "rel_cdc_incr_agg" ->
      s"""WITH $stagedSql
         |SELECT o_orderpriority, COUNT(*) AS n_rows,
         |${sqlSum("o_totalprice")} AS sum_price
         |FROM staged GROUP BY 1""".stripMargin,
  )
}
