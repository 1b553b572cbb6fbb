package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Logical-plan-level access for custom operators: wrap/unwrap
  * DataFrames around custom `LogicalPlan` nodes (the `Dataset.ofRows`
  * constructor is `private[sql]`).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The ANALYZED plan — stable, resolved attributes, safe to embed
    * under a custom node without re-analysis surprises.
    */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
