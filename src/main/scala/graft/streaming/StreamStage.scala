package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic arrival-order staging for file-stream feeds.
  *
  * `FileStreamSource` with `latestFirst=false` (the default) admits
  * files oldest-modification-time first, so a feed's intended batch
  * order is exactly its files' mtime order. The operators that depend
  * on arrival order (E31's timer sessionization; the throughput
  * harness's time-ordered feed) previously enforced it with
  * `Thread.sleep(1100)` between writes — wall-clock luck that a
  * coarse-mtime filesystem or a straggling write commit can break
  * nondeterministically. Here the order is SET, not waited for: write
  * every batch, then stamp strictly increasing `setLastModified`
  * times (2 s apart, ending in the past) over the part-files in
  * write order. No sleeps, no filesystem-granularity assumptions.
  */
object StreamStage {

  /** Stage `batches` under `out` (one parquet part-file each, in
    * order) such that a file stream over `out` observes them as
    * distinct, ordered arrivals. Empty batches are skipped.
    */
  private[graft] def stageOrderedBatches(out: String, batches: Seq[DataFrame]): Unit = {
    val dir = new java.io.File(out)
    def partFiles(): Set[java.io.File] =
      Option(dir.listFiles()).fold(Set.empty[java.io.File])(
        _.filter(_.getName.startsWith("part-")).toSet)
    var seen = partFiles()
    val ordered = batches.flatMap { b =>
      b.coalesce(1).write.mode("append").parquet(out)
      val now = partFiles()
      val fresh = (now -- seen).toSeq
      seen = now
      fresh // 0 files if the batch was empty, else exactly 1
    }
    // strictly increasing, all in the past: a future mtime could fall
    // inside the source's maxFileAge window arithmetic unpredictably
    val t0 = System.currentTimeMillis() - 2000L * (ordered.size + 1)
    ordered.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(t0 + 2000L * i),
        s"setLastModified failed for $f — cannot guarantee arrival order")
    }
  }

  /** Stage `df` as `nFiles` time-range-ordered arrivals (ntile over
    * `tsCol`): batch k holds the k-th quantile slice, so a
    * micro-batched stream's watermark advances BEHIND the data and
    * nothing is dropped late — the approximately-time-ordered regime
    * real feeds have. The global ntile sort is a one-partition window
    * over the staging data only (never a timed path).
    */
  private[graft] def stageTimeOrdered(df: DataFrame, tsCol: String,
                                      out: String, nFiles: Int): Unit = {
    // free the checkpointed staging blocks by RDD id: Dataset.unpersist
    // is a no-op for localCheckpoint'ed frames (CacheManager has no
    // entry — the storage is on the internal RDD), the exact leak
    // class fixed in Graph.dropSharedCache this round
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val bucketed = df
      .withColumn("_b", ntile(nFiles).over(Window.orderBy(col(tsCol))))
      .localCheckpoint()
    val mine = sc.getPersistentRDDs.keySet -- before
    try
      stageOrderedBatches(out,
        (1 to nFiles).map(b => bucketed.filter(col("_b") === b).drop("_b")))
    finally {
      val persisted = sc.getPersistentRDDs
      mine.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = true)))
    }
  }
}
