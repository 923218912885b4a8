package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql-private `Dataset.ofRows` so graft's custom
  * logical nodes (`graft.plans.AsOfJoinNode`) can be wrapped back into
  * a public DataFrame — the standard technique for extension libraries
  * that add planner nodes (the rest of graft lives outside the Spark
  * namespace; this object is the single deliberate exception).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
