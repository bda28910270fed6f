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

  /** The session's catalog plugin registered under `name`, if any
    * (CatalogManager is `private[sql]`). */
  def catalogPlugin(spark: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(spark.sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }

  /** Drop the session's instantiated catalog plugins so changed
    * `spark.sql.catalog.*` options re-apply (test harness use). */
  def resetCatalogs(spark: SparkSession): Unit =
    spark.sessionState.catalogManager.reset()
}
