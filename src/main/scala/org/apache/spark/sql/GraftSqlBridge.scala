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

  /** Spark's `private[sql]` bounded-heap top-k collector
    * ([[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK]])
    * as a Column aggregate: CollectTopK's BoundedPriorityQueue keeps the
    * `num` LARGEST values under its ordering, so `reverse = false` keeps
    * the num MAXIMAL values of `e` and `reverse = true` keeps the
    * MINIMAL ones (what [[graft.transform.Skew.aggTopK]] passes —
    * SkewSpec pins it), merging map-side — the partial-aggregating
    * replacement for a per-key rank window whose input is pair-scale
    * (r21, guide §2.3 "aggregate before you shuffle"). Output array
    * order is the heap's (unspecified) — callers sort it (`array_sort`)
    * before relying on positions.
    */
  def collectTopK(e: Column, num: Int, reverse: Boolean): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftAggBridge.collectTopK(expression(e), num, reverse))
}
