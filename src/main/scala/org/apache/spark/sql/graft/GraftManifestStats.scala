package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.types.StructType

import java.util.OptionalLong

/** K49: manifest-fed scan statistics.
  *
  * A V2 relation with no `SupportsReportStatistics` scan planes at the
  * conf default size (effectively "huge"), so a catalog dim table
  * NEVER auto-broadcasts and every lake join pays two shuffles — at
  * 100 TB the single most expensive default in the plan. The manifest
  * already knows the truth at metadata cost: per-file row counts since
  * K11, and per-file on-disk bytes since this round (measured by the
  * commit's one recursive listing, carried forward by reference). This
  * helper folds a snapshot's rows into the `Statistics` every graft
  * scan now reports:
  *
  *   - `numRows` — exact from the manifest (minus exactly-known
  *     position deletes on K42 tables; equality deletes are NOT
  *     subtracted — a delete key may match nothing, and overestimating
  *     is the safe direction for broadcast planning);
  *   - `sizeInBytes` — the summed on-disk lengths where known, with a
  *     rows × schema-width fallback for pre-K49 manifests (`bytes` -1)
  *     so old tables degrade to an estimate, never to "huge".
  *
  * Sizes are ON-DISK (compressed) bytes — the Delta/Iceberg reporting
  * convention Spark's `autoBroadcastJoinThreshold` is tuned against.
  * Stats are computed on the PRUNED file list (the builder hands the
  * scan its post-pushdown survivors), so a filtered scan reports the
  * filtered size — the same post-pushdown contract `FileScan` honors.
  */
object GraftManifestStats {

  def of(rows: Seq[GraftLakeTable.ManifestRow], schema: StructType,
         deletedRows: Long = 0L): Statistics = {
    val data = rows.filterNot(r => GraftDeltaOperation.isDeleteFile(r.file))
    val totalRows = math.max(0L, data.map(_.nRows).sum - deletedRows)
    val width = math.max(1, schema.defaultSize).toLong
    val size = data.map(r => if (r.bytes >= 0L) r.bytes else r.nRows * width).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(math.max(1L, size))
      override def numRows(): OptionalLong = OptionalLong.of(totalRows)
    }
  }
}
