package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only forwarder (same honest-bridge discipline as
  * GraftSqlBridge/GraftSqlShim, but in the TEST source set): exposes
  * `SparkContext.listenerBus.waitUntilEmpty`, which is `private[spark]`,
  * so the action-free-construction pin can drain the async listener
  * bus DETERMINISTICALLY instead of sleeping a fixed 500 ms (ADVICE
  * r6 #4: a fixed sleep both misses late-arriving events on a loaded
  * box and adds flat latency to every run). */
object ListenerBusDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
