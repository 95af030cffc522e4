package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** The persistent RDD ids BACKING a `localCheckpoint`'ed Dataset,
  * read from the frame's own plan (its `LogicalRDD` leaves) rather
  * than diffing `getPersistentRDDs` around the build — the set-diff
  * attributes any RDD persisted CONCURRENTLY in the window to the
  * wrong owner, and a blocking unpersist of a mis-attributed
  * localCheckpoint'ed RDD frees that other query's ONLY block copy
  * (lineage is truncated, so it fails with "checkpoint block not
  * found" instead of recomputing). Reading the ids off the Dataset
  * makes cache accounting correct under concurrent sessions/suites.
  *
  * `Dataset.localCheckpoint()` persists the internal row RDD and
  * wraps exactly that RDD in the returned frame's `LogicalRDD`, so
  * these ids are the ones `localCheckpoint` persisted.
  */
object CheckpointIds {
  def of(frames: Dataset[_]*): Seq[Int] =
    frames.flatMap(_.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd.id
    }).distinct.sorted

  /** Non-blocking unpersist of the checkpoint blocks backing `frames`
    * — for SUPERSEDED loop-round frames whose data is provably never
    * read again. A dereferenced localCheckpoint is otherwise reclaimed
    * only by the async ContextCleaner after a GC, and back-to-back
    * invocations in one JVM accumulate every earlier run's frames
    * until storage-eviction churn degrades later runs (r14 finding:
    * k-truss warm iterations 11 s → 21 s inside one bench entry).
    */
  def free(frames: Dataset[_]*): Unit =
    frames.headOption.foreach { f =>
      val persisted = f.sparkSession.sparkContext.getPersistentRDDs
      of(frames: _*).foreach(id =>
        persisted.get(id).foreach(_.unpersist(blocking = false)))
    }
}
