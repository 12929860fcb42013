package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `Column.expr` bridge
  * (Spark Connect split). This shim re-exposes the classic conversions for
  * our custom Catalyst expressions — the same in-package-shim pattern
  * third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
