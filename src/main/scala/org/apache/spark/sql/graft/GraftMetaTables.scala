package org.apache.spark.sql.graft

import java.util

import graft.sinks.ManifestStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** K40: metadata tables over a lake table's commit history — the
  * Iceberg `t.history` / `t.files` surface (Delta's DESCRIBE HISTORY
  * as a RELATION): plain SQL over the table's own metadata, joinable
  * and aggregatable like any other table.
  *
  *   - `<t>.history` — one row per committed version: commit instant
  *     (the in-commit-normalized mtime `TIMESTAMP AS OF` resolves
  *     against), file/row totals, and the K39 delete-file split.
  *   - `<t>.files` — the CURRENT snapshot's manifest rows: relative
  *     path, row count, commit seq, delete-file flag, txn tag.
  *
  * Both are [[LocalScan]]s computed from the manifest on the DRIVER —
  * the whole point of the lakehouse metadata plane is that these
  * answers are manifest-sized, never data-sized: at 100 TB `history`
  * costs versions × manifest-rows of JSON, and no data file is opened.
  */
private[graft] class GraftMetaTable(kind: String, dir: String, fullName: String)
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
      override def description(): String = s"GraftMetaTable($fullName)"
    }: Scan

  private def computeRows(): Array[InternalRow] = kind match {
    case "history" =>
      ManifestStore.versionsWithTimes(spark, manBase).map { case (v, t) =>
        val rows = GraftLakeTable.manifestRowsFull(spark, manBase, v)
        val (del, data) = rows.partition(r => GraftDeltaOperation.isDeleteFile(r.file))
        new GenericInternalRow(Array[Any](
          v, t, data.length.toLong, data.map(_.nRows).sum,
          del.length.toLong, del.map(_.nRows).sum)): InternalRow
      }.toArray
    case "files" =>
      val committed = ManifestStore.versions(spark, manBase)
      committed.lastOption.toSeq.flatMap { v =>
        GraftLakeTable.manifestRowsFull(spark, manBase, v).sortBy(_.file).map { r =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(r.file), r.nRows, r.seq,
            GraftDeltaOperation.isDeleteFile(r.file),
            UTF8String.fromString(r.txn))): InternalRow
        }
      }.toArray
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }
}

private[graft] object GraftMetaTable {
  val kinds: Set[String] = Set("history", "files")

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
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }
}
