package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to [[CollectTopK]], which is `private[aggregate]` — the same
  * extension-point shim pattern as
  * [[org.apache.spark.sql.GraftSqlBridge]]: no Spark internals are
  * modified, only a constructor surfaced. CollectTopK is Spark's own
  * bounded-priority-queue top-k collector (one heap of `num` entries
  * per group, merged map-side), which is exactly the
  * partial-aggregating shape a per-key rank-window cut lacks.
  */
object GraftAggBridge {
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(e, num, reverse).toAggregateExpression()
}
