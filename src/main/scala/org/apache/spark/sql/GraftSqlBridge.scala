package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors that third-party Spark
  * extensions need: building a DataFrame from a custom LogicalPlan.
  * The standard technique for Spark-extension libraries (the planner
  * strategy itself is injected through the public
  * SparkSessionExtensions / experimental API).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
