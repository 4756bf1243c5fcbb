package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface needed by custom Catalyst
  * expressions (the Expression↔Column constructors lost their public form
  * in the Spark-Connect API split). Standard extension-library technique;
  * everything else in this project stays on the public API.
  */
package object graftshim {

  /** Public alias for the `private[sql]` type family so custom expressions
    * outside org.apache.spark.sql can implement `ExpectsInputTypes`.
    */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def exprToColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def colToExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (runs the analyzer). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Physical plan of a streaming query's last completed micro-batch —
    * lets StreamingSpec lock streaming join/state strategies the way
    * PlanSpec locks batch plans.
    */
  def lastStreamingPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q.asInstanceOf[execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString

  /** Register a builder under `name` in the session's function registry so
    * the expression is callable from SQL text as well.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
