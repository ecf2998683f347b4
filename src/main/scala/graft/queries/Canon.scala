package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine float canonicalization shared by every oracle-matched
  * query (SURVEY §7.4).
  *
  * The fixture's numeric columns are exact ≤4-decimal values, so casting
  * to DECIMAL(18,4) is lossless and decimal sums are order-independent —
  * identical in Spark and DuckDB regardless of partial-aggregation order.
  * Division is done afterwards in IEEE double on bit-identical inputs, so
  * the quotient is bit-identical too. No rounding or tolerance anywhere.
  *
  * Every helper here has a SQL twin generating the same arithmetic for
  * DuckDB; queries MUST use the pair together.
  */
object Canon {
  val InputDec: DecimalType = DecimalType(18, 4)

  /** Lossless exact container for a ≤4-decimal double column. */
  def dec(c: Column): Column = c.cast(InputDec)

  /** Exact sum, exported as double. */
  def exactSum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact mean: exact decimal sum ÷ non-null count, in double. */
  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  /** Exact sum of the 8-decimal product a*b (each ≤4-decimal). */
  def exactSumProd(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast(DoubleType)

  // ------------------------------------------------------------ SQL twins

  def sqlDec(x: String): String = s"CAST($x AS DECIMAL(18,4))"

  /** DECIMAL → DOUBLE via VARCHAR: DuckDB's direct decimal→double cast is
    * doubly-rounded ((double)unscaled / 10^scale — observed 1-ulp drift
    * vs Java), while decimal→varchar→double is exact digits then a
    * correctly-rounded parse, matching Java BigDecimal.doubleValue. */
  def sqlToDouble(x: String): String = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"

  def sqlSum(x: String): String = sqlToDouble(s"SUM(${sqlDec(x)})")
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT($x)"
  def sqlSumProd(a: String, b: String): String =
    sqlToDouble(s"SUM(${sqlDec(a)} * ${sqlDec(b)})")
}
