package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so the engine can build
  * DataFrames from its own logical plan nodes. Lives under
  * org.apache.spark.sql.* purely for access; contains no Spark code.
  */
object OfRows {
  def apply(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
