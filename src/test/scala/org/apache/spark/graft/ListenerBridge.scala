package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `SparkContext.listenerBus` (private[spark]):
  * lets specs drain queued listener events before asserting on what a
  * SparkListener recorded (delivery is asynchronous). */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
