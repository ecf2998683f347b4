package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic module's Column↔Expression converters, which
  * are `private[sql]` in Spark 4 (the constructor `new Column(expr)` of
  * Spark 3 is gone). Living under org.apache.spark.sql.* is the
  * established extension-library pattern for this single access point;
  * everything else in graft uses only public APIs. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
