package org.apache.spark

/** Bridge into `private[spark]` core internals (sibling of
  * org.apache.spark.sql.GraftBridge — same standard pattern, nothing else
  * in this package).
  *
  * `detachAppStatusListener` exists because the AppStatusListener cannot be
  * disabled by configuration, yet on long-running iterative workloads it is
  * a driver-memory leak: an endurance stream emits hundreds of tiny jobs
  * per second, the appStatus AsyncEventQueue saturates and DROPS events
  * (observed ~10k/min even at 3× default capacity), and every dropped
  * stage/job/unpersist completion strands entries in the listener's
  * live-entity maps forever — measured 41M live RDDInfo objects (~17 GB)
  * after ~70 batches, OOMing a 48 GB driver. With `spark.ui.enabled=false`
  * nothing reads the status store, so detaching the listener is pure win
  * for such sessions; callers gate on that.
  */
object GraftSparkBridge {
  /** Remove the AppStatusListener from the listener bus. Call only when
    * the UI is disabled and no SparkStatusTracker consumer is in play. */
  def detachAppStatusListener(sc: SparkContext): Unit =
    sc.statusStore.listener.foreach(sc.listenerBus.removeListener)
}
