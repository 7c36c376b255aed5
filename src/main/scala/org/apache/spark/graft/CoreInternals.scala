package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal bridge into Spark-core `private[spark]` surfaces. Lives under
  * the org.apache.spark package solely to satisfy the access check.
  */
object CoreInternals {

  /** Block until the listener bus has delivered every queued event (or
    * the timeout elapses). Needed to read job/stage counters gathered by
    * a SparkListener right after an action returns — listener delivery
    * is asynchronous, and a fixed sleep is either too slow or racy. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
