package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` DataFrame constructor so graft's
  * custom logical operators ([[graft.plans.TopKPerKeyNode]]) can be
  * wrapped back into the public DataFrame API. Lives in the
  * `org.apache.spark.sql` package solely for that access — the
  * standard pattern for third-party LogicalPlan extensions. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
