package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion.
  *
  * Spark 4 exposes no public way to wrap a Catalyst `Expression` in a
  * `Column` (`ExpressionUtils` is `private[sql]`); graft needs it for
  * expressions that carry non-Expression state — e.g.
  * [[graft.sql.VecTopListsBcast]], whose centroid matrix rides a
  * `Broadcast` handle rather than a plan literal and therefore cannot be
  * built through the public function registry (registry builders only
  * receive child Expressions).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
