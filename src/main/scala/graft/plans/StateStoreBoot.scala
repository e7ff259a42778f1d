package org.apache.spark.sql.execution.streaming.state

import org.apache.spark.sql.classic.SparkSession

/** Batch `transformWithState` needs the driver-side StateStoreCoordinator
  * RPC endpoint, which Spark only bootstraps when a STREAMING query starts
  * (`StreamingQueryManager.stateStoreCoordinator` is package-private and
  * lazily initialized by `StreamExecution`); without it every batch task
  * dies with CANNOT_LOAD_STATE_STORE / RpcEndpointNotFoundException.
  * This shim lives in Spark's package namespace only to reach the
  * `private[state]` factory; `forDriver` is idempotent (creates the endpoint
  * or binds to the existing one), so calling it before each batch
  * transformWithState query is safe.
  */
object GraftStateStoreBoot {
  def ensureCoordinator(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[SparkSession]
    StateStoreCoordinatorRef.forDriver(
      classic.sparkContext.env, classic.sessionState.conf)
  }
}
