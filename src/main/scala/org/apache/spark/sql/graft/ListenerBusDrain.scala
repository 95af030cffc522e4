package org.apache.spark.sql.graft

/** Block until the async listener bus has delivered every queued
  * event — what makes a job-counting listener's reading EXACT at a
  * measurement boundary instead of racing the bus (the r14 streaming
  * adjudication channel needs per-entry job counts that line up with
  * the wall-clock window they were measured in). `waitUntilEmpty` is
  * `private[spark]`, reachable from this package; failures degrade to
  * a best-effort count, never an error.
  */
object ListenerBusDrain {
  def drain(sc: org.apache.spark.SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty() catch { case _: Exception => () }
}
