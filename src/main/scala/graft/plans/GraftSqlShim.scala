package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge (the StateStoreBoot precedent): constructs a
  * DataFrame from a custom LogicalPlan — what `Dataset.ofRows` does for
  * every internal operator; Spark exposes no public equivalent for
  * extension-provided nodes, so the graft range-join constructor routes
  * through this one-liner. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
