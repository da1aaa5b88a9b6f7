package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `classic.Dataset.ofRows` (package-private to `sql`)
  * so graft's custom logical plans (graft.plans.TopKPerGroupPlan) can be
  * wrapped as DataFrames — the standard shim every Spark extension
  * library ships to plan custom operators from user code. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
