package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's namespace: a custom
  * logical operator (graft.plans.AsofJoinNode) needs wrapping into a
  * DataFrame, and `Dataset.ofRows` is `private[sql]` — this forwarder
  * lives in `org.apache.spark.sql` solely to re-export it. No Spark
  * behavior is patched, overridden, or shadowed; the alternative
  * (reflection) would do the same with less type safety. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 removed public `.expr`) */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
