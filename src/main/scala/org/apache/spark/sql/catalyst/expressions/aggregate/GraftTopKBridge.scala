package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Same-package bridge to the `private[aggregate]` CollectTopK — the
  * engine-internal bounded-heap top-k aggregate (pandas-on-Spark's
  * nlargest path). See GraftSqlBridge.collectTopK for the public face
  * and the scale rationale. */
object GraftTopKBridge {
  def collectTopK(e: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(e, k, reverse).toAggregateExpression()
}
