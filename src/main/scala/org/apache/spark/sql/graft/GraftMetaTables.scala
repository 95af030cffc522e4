package org.apache.spark.sql.graft

import java.util

import graft.sinks.ManifestStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** K40/K43: metadata tables over a lake table's commit history — the
  * Iceberg `t.history` / `t.files` / `t.partitions` surface (Delta's
  * DESCRIBE HISTORY as a RELATION): plain SQL over the table's own
  * metadata, joinable and aggregatable like any other table.
  *
  *   - `<t>.history` — one row per committed version: commit instant
  *     (the in-commit-normalized mtime `TIMESTAMP AS OF` resolves
  *     against), file/row totals, and the K39 delete-file split.
  *   - `<t>.files` — a snapshot's manifest rows: relative path, row
  *     count, commit seq, delete-file flag, txn tag.
  *   - `<t>.partitions` — the per-partition rollup (K43): partition
  *     value (the bucket directory for K34 tables, '' for flat
  *     layouts) → live data files, rows, and on-disk bytes. This is
  *     what layout monitoring and T38-style completeness checks read
  *     instead of listing the filesystem.
  *
  * All three accept `VERSION AS OF` (K43's second half): the catalog
  * resolves `t.files VERSION AS OF 3` to this table pinned at v3 —
  * `files`/`partitions` report THAT snapshot, `history` truncates to
  * commits ≤ v3 (the metadata view a reader pinned at v3 would see).
  *
  * All are [[LocalScan]]s computed from the manifest on the DRIVER —
  * the whole point of the lakehouse metadata plane is that these
  * answers are manifest-sized, never data-sized: at 100 TB `history`
  * costs versions × manifest-rows of JSON, `partitions` adds one
  * file-status call per live file, and no data file is opened.
  */
private[graft] class GraftMetaTable(kind: String, dir: String, fullName: String,
                                    pinned: Option[Long] = None)
  extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  override def name(): String = fullName
  override def schema(): StructType = GraftMetaTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] = computeRows()
      override def description(): String =
        s"GraftMetaTable($fullName${pinned.fold("")(v => s" @v$v")})"
    }: Scan

  /** The snapshot version this metadata read reports — the pin when
    * given (validated committed, named error otherwise), else latest.
    */
  private def resolved(committed: Seq[Long]): Option[Long] = pinned match {
    case Some(v) =>
      if (!committed.contains(v)) throw new java.util.NoSuchElementException(
        s"$fullName: version $v is not committed (available: ${committed.mkString(", ")})")
      Some(v)
    case None => committed.lastOption
  }

  private def computeRows(): Array[InternalRow] = kind match {
    case "history" =>
      val upTo = resolved(ManifestStore.versions(spark, manBase))
      ManifestStore.versionsWithTimes(spark, manBase)
        .filter { case (v, _) => upTo.exists(v <= _) }
        .map { case (v, t) =>
          val rows = GraftLakeTable.manifestRowsFull(spark, manBase, v)
          val (del, data) = rows.partition(r => GraftDeltaOperation.isDeleteFile(r.file))
          new GenericInternalRow(Array[Any](
            v, t, data.length.toLong, data.map(_.nRows).sum,
            del.length.toLong, del.map(_.nRows).sum)): InternalRow
        }.toArray
    case "files" =>
      resolved(ManifestStore.versions(spark, manBase)).toSeq.flatMap { v =>
        GraftLakeTable.manifestRowsFull(spark, manBase, v).sortBy(_.file).map { r =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(r.file), r.nRows, r.seq,
            GraftDeltaOperation.isDeleteFile(r.file),
            UTF8String.fromString(r.txn))): InternalRow
        }
      }.toArray
    case "partitions" =>
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      resolved(ManifestStore.versions(spark, manBase)).toSeq.flatMap { v =>
        val data = GraftLakeTable.manifestRowsFull(spark, manBase, v)
          .filterNot(r => GraftDeltaOperation.isDeleteFile(r.file))
        data.groupBy(r => GraftMetaTable.partitionOf(r.file)).toSeq.sortBy(_._1)
          .map { case (part, rs) =>
            val bytes = rs.map(r =>
              fs.getFileStatus(new Path(dir, r.file)).getLen).sum
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(part), rs.length.toLong,
              rs.map(_.nRows).sum, bytes)): InternalRow
          }
      }.toArray
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }
}

private[graft] object GraftMetaTable {
  val kinds: Set[String] = Set("history", "files", "partitions")

  /** A manifest-relative file's partition value: the partition
    * directory component between the write dir and the file (the K34
    * bucket-routing layout `data_<writer>/__graft_bucket=N/part-…`);
    * flat layouts report ''.
    */
  private[graft] def partitionOf(relFile: String): String = {
    val segs = relFile.split('/')
    if (segs.length >= 3 && segs(1).contains("=")) segs(1) else ""
  }

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at_millis", LongType, nullable = false),
      StructField("n_data_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_delete_files", LongType, nullable = false),
      StructField("n_delete_keys", LongType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("is_delete", BooleanType, nullable = false),
      StructField("txn", StringType, nullable = false)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }
}
