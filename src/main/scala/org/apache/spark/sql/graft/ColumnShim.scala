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

  /** Tag a provably-non-null expression so the optimizer stops
    * inferring `isnotnull(<expr>)` join-key filters from it. Predicate
    * pushdown inlines such an inferred filter BELOW the producing
    * projection, re-evaluating the full expression once per conjunct
    * (the round-7 aliased-projection trap) — for a per-row digest like
    * `md5(substr(...))` that silently doubles the dominant per-row
    * work on BOTH sides of a self-derived join (measured on q112:
    * the plan carried `Filter isnotnull(md5(cast(substr(text, pos,
    * 30)...)))` under each Generate). ONLY wrap expressions that are
    * null-free by construction (non-null inputs through null-intolerant
    * functions): the tag is a promise the optimizer believes.
    */
  def knownNotNull(c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.KnownNotNull(
      expression(c)))
}
