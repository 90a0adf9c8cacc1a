package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst Expression to a user-facing Column (the
  * Spark 4 Column wraps a ColumnNode, and the converter lives behind
  * `private[sql]`). Session-independent — unlike the function-registry
  * route, a Column built here resolves in ANY session without a
  * register() call having run first, which removes a whole class of
  * "operator forgot to register before its first select" failures for
  * expressions used inside operators (registry registration remains
  * the route for SQL-text access, e.g. q82's vecdot).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
