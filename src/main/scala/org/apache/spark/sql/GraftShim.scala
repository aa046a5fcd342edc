package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `Dataset.ofRows`, which is `private[sql]` — the
  * standard mechanism for libraries that construct custom logical plans
  * (graft.plans.AsOfJoinPlan) and need a DataFrame back. Nothing else
  * from the private API surface is touched. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridges (`classic.ExpressionUtils` is
    * `private[sql]`): needed when a custom Expression must carry an
    * INLINE literal operand through a higher-order-function lambda
    * (graft.streaming.DecontamStream's bloom gate). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
