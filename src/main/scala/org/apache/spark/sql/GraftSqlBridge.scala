package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions (graft.functions) can surface as
  * user-facing `Column`s. This is the standard extension-point shim —
  * the same access path Spark's own connectors use; no Spark internals
  * are modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
