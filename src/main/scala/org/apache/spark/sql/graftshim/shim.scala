package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` surface; the
  * supported bridge lives in `org.apache.spark.sql.classic` as
  * `private[sql]`. This shim (in the sql namespace by design, same pattern
  * as every Spark extension library) re-exports just the two conversions
  * the engine's custom Catalyst expressions need.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
