package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener plumbing: lets specs
  * drain the async listener bus before reading accumulated task metrics,
  * so measurements are deterministic instead of sleep-based.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
