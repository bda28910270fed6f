package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}

/** Two more `private[sql]` bridges for the native row-level SQL verbs
  * ([[graft.plans.GraftRowLevelStrategy]]): materialize a resolved
  * `LogicalPlan` as a DataFrame (the MERGE source arrives as a plan), and
  * wrap a Catalyst `Expression` as a public `Column` (conditions and SET
  * values arrive as resolved expressions). Same discipline as
  * [[StreamShim]]: constructors only, all logic stays in `graft`. */
object PlanBridge {

  /** A resolved logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** A Catalyst expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
