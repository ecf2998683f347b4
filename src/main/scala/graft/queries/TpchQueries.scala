package graft.queries

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import Canon._

/** The five TPC-H query shapes not yet covered by
  * [[RelationalQueries]] — Q6, Q10, Q12, Q16, Q20 — completing the full
  * 22-shape suite over the fixture's slimmed star schema. Where the
  * fixture lacks a TPC-H column (no `partsupp`, `l_shipmode`,
  * `l_commitdate`, `ps_availqty`), the query keeps the SHAPE (the plan
  * structure that matters at scale) against an equivalent column:
  *
  *  - Q12's shipmode two-class pivot → 30-day ship-delay buckets
  *    (the fixture ships −80..+82 days around the order date).
  *  - Q16's partsupp supplier-count → the (l_partkey, l_suppkey) link
  *    implicit in lineitem.
  *  - Q20's availqty>½·sold excess test → a dominant-supplier test
  *    (supplier sold more than half a part's total volume).
  *
  * Scale notes: Q6 is a pure scan-side filter+agg (no shuffle beyond a
  * 1-row partial merge); Q10/Q20 shuffle lineitem once on its join key
  * with dims broadcast; Q16's distinct-count shuffles the (brand, type,
  * size, suppkey) projection only after the anti join prunes; Q12 is a
  * single map-side-combined agg over the orders⋈lineitem join.
  */
object TpchQueries {

  private def ts(s: String): LocalDateTime = LocalDateTime.parse(s + "T00:00:00")

  /** TPC-H Q6: forecasting-revenue-change — tight scan-side conjunction
    * (date window, discount band, quantity cap), one exact sum. The whole
    * query is a parquet scan with every predicate pushed + a 1-row agg:
    * the cheapest possible plan at any scale. */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(ts("1997-01-01")) &&
              col("l_shipdate") <  lit(ts("1998-01-01")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(exactSumProd(col("l_extendedprice"), col("l_discount")).as("revenue"),
           count(lit(1)).as("n_lines"))

  /** TPC-H Q10: returned-item reporting — customers ranked by revenue
    * lost to returns in a half-year window. Lineitem (returnflag=R) joins
    * orders on the shuffle key; customer and nation broadcast; global
    * top-20 via TakeOrderedAndProject (no full sort). */
  def returnedTopCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(ts("1997-01-01")) &&
              col("o_orderdate") <  lit(ts("1997-07-01")))
    val grouped = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(exactSumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
             .as("revenue"),
           count(lit(1)).as("n_lines"))
    Relational.globalTopK(grouped,
      Seq(col("revenue").desc, col("c_custkey").asc), 20)
  }

  /** TPC-H Q12: shipping-class / order-priority two-class pivot. The
    * fixture has no l_shipmode, so the grouping key is the 30-day
    * ship-delay bucket (floor((ship−order)/30d); negative = shipped
    * early); the CASE-sum pivot (URGENT+HIGH vs rest) is Q12's exact
    * aggregation structure — one shuffled join + map-side-combined agg. */
  def shipDelayClasses(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_bucket",
        floor(datediff(col("l_shipdate").cast("date"),
                       col("o_orderdate").cast("date")) / 30.0).cast("int"))
      .groupBy(col("delay_bucket"))
      .agg(sum(when(col("o_orderpriority") === "1-URGENT" ||
                    col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
             .as("high_line_count"),
           sum(when(col("o_orderpriority") =!= "1-URGENT" &&
                    col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
             .as("low_line_count"))

  /** TPC-H Q16: parts/supplier relationship — distinct suppliers per
    * (brand, type, size) over a filtered part subset, excluding
    * flagged suppliers. The partsupp link is lineitem's (partkey,
    * suppkey) pair; "customer complaints" is a negative account balance.
    * The NOT IN is a broadcast anti join BEFORE the distinct-count
    * shuffle, so excluded suppliers never enter the exchange. */
  def partSupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
              !col("p_type").like("PROMO%") &&
              col("p_size").isin(1, 5, 10, 15, 20, 25))
    Tables.lineitem(s, dir)
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20: potential-part-promotion nested-subquery chain. Without
    * ps_availqty the excess test becomes dominance: suppliers who shipped
    * more than half of a red part's total 1997 volume. Two stacked
    * aggregations over one lineitem scan (per-(part,supplier) then
    * per-part totals), a broadcast threshold join, then supplier/nation
    * broadcast enrichment — Q20's IN-chain decorrelated into joins. */
  def excessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir)
      .filter(col("p_name").like("red %")).select(col("p_partkey"))
    // The whole sold→total→dominance chain stays in exact decimal:
    // double re-sums would be order-dependent across engines, and the
    // dominance test 2·sold > total is an exact integer-scaled compare
    // (a supplier at exactly half is consistently excluded).
    val sold = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(ts("1997-01-01")) &&
              col("l_shipdate") <  lit(ts("1998-01-01")))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("sold_dec"))
    val totals = sold.groupBy(col("l_partkey"))
      .agg(sum(col("sold_dec")).as("part_total"))
    val dominant = sold
      .join(totals, "l_partkey")
      .filter(col("sold_dec") * 2 > col("part_total"))
    dominant
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant_parts"),
           sum(col("sold_dec")).cast(org.apache.spark.sql.types.DoubleType)
             .as("sum_sold"))
      .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"),
              col("n_dominant_parts"), col("sum_sold"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_forecast_revenue"      -> (forecastRevenue _),
    "rel_returned_top_customers"-> (returnedTopCustomers _),
    "rel_ship_delay_classes"    -> (shipDelayClasses _),
    "rel_part_supplier_cnt"     -> (partSupplierCnt _),
    "rel_excess_suppliers"      -> (excessSuppliers _),
  )

  val oracles: Map[String, String] = Map(
    "rel_forecast_revenue" ->
      s"""SELECT ${sqlSumProd("l_extendedprice", "l_discount")} AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "rel_returned_top_customers" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |${sqlSumProd("l_extendedprice", "(1.0 - l_discount)")} AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-07-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "rel_ship_delay_classes" ->
      s"""SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 30.0)
         |  AS INTEGER) AS delay_bucket,
         |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
         |  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin,
    "rel_part_supplier_cnt" ->
      s"""SELECT p_brand, p_type, p_size,
         |COUNT(DISTINCT l_suppkey) AS supplier_cnt
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_brand <> 'Brand#1'
         |  AND p_type NOT LIKE 'PROMO%'
         |  AND p_size IN (1, 5, 10, 15, 20, 25)
         |  AND l_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3""".stripMargin,
    "rel_excess_suppliers" ->
      s"""WITH sold AS (
         |  SELECT l_partkey, l_suppkey,
         |    SUM(${sqlDec("l_quantity")}) AS sold_dec
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE 'red %'
         |    AND l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate <  TIMESTAMP '1998-01-01'
         |  GROUP BY 1, 2),
         |totals AS (
         |  SELECT l_partkey, SUM(sold_dec) AS part_total FROM sold GROUP BY 1),
         |dominant AS (
         |  SELECT l_suppkey, COUNT(*) AS n_dominant_parts,
         |         ${sqlToDouble("SUM(sold_dec)")} AS sum_sold
         |  FROM sold JOIN totals USING (l_partkey)
         |  WHERE sold_dec * 2 > part_total
         |  GROUP BY 1)
         |SELECT s_name, n_name, n_dominant_parts, sum_sold
         |FROM dominant
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
  )
}
