package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Listener-bus drain bridge. `SparkContext.listenerBus` is
  * private[spark]; benchmark attribution needs a synchronous "all task-end
  * events for the job I just ran are delivered" point, or per-query
  * metric windows bleed into each other (listener events post
  * asynchronously). Package-nested shim, same pattern as
  * [[org.apache.spark.sql.graftshim.ColumnBridge]].
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
