package org.apache.spark

/** Test-only access to the private[spark] listener-bus flush, so the
  * PlanAuditSuite collect-budget sweep can deterministically wait for its
  * QueryExecutionListener events instead of sleeping (same package-injection
  * precedent as GraftStateStoreBoot). */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
