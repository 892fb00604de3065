package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan -> DataFrame bridge. `Dataset.ofRows` is `private[sql]`,
  * so (like [[ColumnBridge]]) this lives under org.apache.spark.sql —
  * the standard shim pattern for extension libraries that define custom
  * logical operators and need to hand them back to users as DataFrames.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
