package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the dev profiler needs
  * its `waitUntilEmpty()` to drain late stage-completion events before
  * clearing its counters (the same subpackage-hosting pattern as
  * [[org.apache.spark.sql.graftbridge.Bridge]]). Dev tooling only — no
  * query path touches this.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
