package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K42/E38: the lake table as a STREAMING SOURCE —
  * `spark.readStream.table("graft.lake.t")`, the Delta streaming-source
  * shape: an OFFSET is a committed manifest version, and a micro-batch
  * is exactly the data files ADDED between two versions (set
  * difference of the two file lists — appends commit whole files, so
  * file granularity IS record granularity here). This closes the CDC
  * loop the lake already writes (E34/E35/E37 stream INTO the lake):
  * downstream jobs now stream OUT of it with exactly-once progress
  * tracked by Spark's own offset checkpointing, resuming mid-history
  * after a restart and picking up only versions committed since.
  *
  * Contract, stated like Delta's: the source follows APPENDS. A
  * version that REMOVES a data file (overwrite, copy-on-write DML,
  * OPTIMIZE's rewrite) fails the stream with a named error unless
  * `ignoreChanges=true` (then added files still flow — rewritten rows
  * may re-deliver, Delta's exact caveat); K39 equality-delete files
  * are metadata, surfaced only with `ignoreDeletes=false` semantics
  * folded into the same option. At 100 TB each `latestOffset` poll
  * costs one manifest listing and each batch plans only the added
  * files — never a table scan.
  */
private[graft] class GraftMicroBatchStream(
    dir: String,
    readSchema: StructType,
    ignoreChanges: Boolean)
  extends MicroBatchStream {

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  private def filesAt(v: Long): Set[String] =
    if (v == 0L) Set.empty
    else GraftLakeTable.manifestRowsFull(spark, manBase, v).map(_.file).toSet

  override def initialOffset(): Offset = GraftVersionOffset(0L)

  override def latestOffset(): Offset =
    GraftVersionOffset(
      ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GraftVersionOffset].version,
      end.asInstanceOf[GraftVersionOffset].version)
    if (e <= s) return Array.empty
    val before = filesAt(s)
    val after = filesAt(e)
    val removed = (before -- after).filterNot(GraftDeltaOperation.isDeleteFile)
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"streaming source over $dir: version range ($s, $e] removed data " +
          s"file(s) ${removed.take(3).mkString(", ")} — the source follows " +
          "appends; pass option ignoreChanges=true to stream past " +
          "rewrites (rewritten rows may re-deliver)")
    val added = (after -- before).filterNot(GraftDeltaOperation.isDeleteFile)
      .toSeq.sorted
    if (added.isEmpty) Array.empty
    else scanOver(added).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the parquet reader factory depends on schema/conf, not on a
    // specific file list — one built over the current snapshot reads
    // any planned FilePartition
    scanOver(filesAt(latestOffset().asInstanceOf[GraftVersionOffset].version)
      .filterNot(GraftDeltaOperation.isDeleteFile).toSeq.sorted)
      .toBatch.createReaderFactory()

  private def scanOver(relFiles: Seq[String]): Scan = {
    val builder = ParquetTable("graft-stream-source", spark,
      CaseInsensitiveStringMap.empty(), relFiles.map(f => s"$dir/$f"),
      Some(readSchema), classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    builder.pruneColumns(readSchema)
    builder.build()
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Wraps a lake table's batch scan with the micro-batch stream hook —
  * batch reads delegate untouched; `readStream` gets the
  * version-offset source.
  */
private[graft] class GraftLakeScanBuilder(
    inner: ScanBuilder,
    dir: String,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var requested: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requested = requiredSchema
    inner match {
      case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
        p.pruneColumns(requiredSchema)
      case _ => ()
    }
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner match {
      case p: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
        p.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner match {
      case p: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
        p.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan =
    GraftLakeScan(inner.build(), dir, requested,
      ignoreChanges = options.getBoolean("ignoreChanges", false))
}

/** A case class (NOT an anonymous Scan) so exchange/scan-reuse keeps
  * working off value equality, and plan inspectors can unwrap to the
  * inner parquet scan.
  */
case class GraftLakeScan(inner: Scan, dir: String,
                                        requested: StructType,
                                        ignoreChanges: Boolean)
  extends Scan {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(dir, requested, ignoreChanges)
  override def description(): String = inner.description()
}
