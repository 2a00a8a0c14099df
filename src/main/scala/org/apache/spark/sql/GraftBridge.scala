package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom LogicalPlan
  * (the supported surface for third-party operators is SparkSessionExtensions
  * + a strategy; constructing the plan-bearing Dataset still needs
  * `Dataset.ofRows`, which is private[sql] — hence this one-file shim, the
  * standard pattern for Spark extension libraries).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (Spark 4 moved `Column.expr` behind the
    * classic converter).
    */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** catalyst Expression → Column — for kernels carrying non-literal plan
    * constants (e.g. a collected codebook array), which the temp-function
    * registry cannot express.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
