package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only shim into Spark's private[spark] listener bus so specs
  * that count jobs via a SparkListener can drain pending events before
  * asserting (listener delivery is async).
  */
object TestListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
