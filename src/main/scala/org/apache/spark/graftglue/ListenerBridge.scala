package org.apache.spark.graftglue

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this shim re-exports
  * the one drain call the shuffle-volume probe needs so stage metrics
  * are fully delivered before counters are read (listener events are
  * async). Same rationale as `sql.graftglue.Bridge`; no other internal
  * API is touched. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
