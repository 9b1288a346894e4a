package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Single `private[sql]` access shim (the standard extension-library
  * pattern): construct a DataFrame from an analyzed LogicalPlan —
  * needed by [[graft.catalog.GraftMergeCommand]] to hand the MERGE
  * source query to the store's merge API. Nothing else in the repo
  * lives outside the `graft` namespace.
  */
object GraftSqlShims {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** The inverse direction: the analyzed LogicalPlan under a DataFrame
    * — lets the `table_changes` TVF hand an API-built feed back to the
    * analyzer as the function's expansion.
    */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
