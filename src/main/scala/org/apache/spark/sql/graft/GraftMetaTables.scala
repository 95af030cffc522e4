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
  *   - `<t>.partitions_history` — the K43 rollup swept across EVERY
  *     retained version (K48): layout drift over time — file-count
  *     growth, partition skew, compaction effect — in one relation,
  *     the input a partition-TTL policy audit needs. Bytes are NULL
  *     for a historical version whose unreferenced files VACUUM
  *     already reclaimed (the row counts stay manifest-true).
  *
  * All accept `VERSION AS OF` (K43's second half): the catalog
  * resolves `t.files VERSION AS OF 3` to this table pinned at v3 —
  * `files`/`partitions` report THAT snapshot, `history` /
  * `partitions_history` truncate to commits ≤ v3 (the metadata view a
  * reader pinned at v3 would see).
  *
  * All are [[LocalScan]]s computed from the manifest on the DRIVER —
  * the whole point of the lakehouse metadata plane is that these
  * answers are manifest-sized, never data-sized: at 100 TB `history`
  * costs versions × manifest-rows of JSON, `partitions` adds ONE
  * recursive listing per write dir (not one file-status call per
  * file — the round-11 ADVICE fix), and no data file is opened. A
  * PINNED `partitions` read whose files were vacuumed fails with the
  * named out-of-retention error, never a raw FileNotFound.
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
      resolved(ManifestStore.versions(spark, manBase)).toSeq.flatMap { v =>
        val data = dataRowsAt(v)
        val bytes = bytesByRel(data)
        data.groupBy(r => GraftMetaTable.partitionOf(r.file)).toSeq.sortBy(_._1)
          .map { case (part, rs) =>
            val total = rs.map(r => bytes.getOrElse(r.file,
              throw new IllegalStateException(
                s"$fullName: file ${r.file} (referenced by version $v) is no " +
                  "longer on disk — it fell out of VACUUM retention; read " +
                  "the latest version, or partitions_history for swept " +
                  "snapshots (bytes NULL there)"))).sum
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(part), rs.length.toLong,
              rs.map(_.nRows).sum, total)): InternalRow
          }
      }.toArray
    case "partitions_history" =>
      // K48: the rollup at EVERY retained version <= the pin. One
      // recursive listing per write dir serves all versions (carried
      // files share dirs); a swept file's bytes report NULL — history
      // must stay readable past VACUUM, row counts are manifest-true
      val committed = ManifestStore.versions(spark, manBase)
      val upTo = resolved(committed)
      val versions = committed.filter(v => upTo.exists(v <= _))
      val allData = versions.map(v => v -> dataRowsAt(v))
      val bytes = bytesByRel(allData.flatMap(_._2).distinctBy(_.file))
      allData.flatMap { case (v, data) =>
        data.groupBy(r => GraftMetaTable.partitionOf(r.file)).toSeq.sortBy(_._1)
          .map { case (part, rs) =>
            val sizes = rs.map(r => bytes.get(r.file))
            val total: Any =
              if (sizes.forall(_.isDefined)) sizes.flatten.sum else null
            new GenericInternalRow(Array[Any](
              v, UTF8String.fromString(part), rs.length.toLong,
              rs.map(_.nRows).sum, total)): InternalRow
          }
      }.toArray
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }

  private def dataRowsAt(v: Long): Seq[GraftLakeTable.ManifestRow] =
    GraftLakeTable.manifestRowsFull(spark, manBase, v)
      .filterNot(r => GraftDeltaOperation.isDeleteFile(r.file))

  /** On-disk length per manifest-relative file, one recursive listing
    * per write directory through the shared
    * [[GraftLakeTable.fileLengthsUnder]] (the same helper the commit's
    * K49 `bytes` measurement uses — one path arithmetic, not two).
    */
  private def bytesByRel(data: Seq[GraftLakeTable.ManifestRow]): Map[String, Long] = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // a K51 transaction workspace carries `../<table>/<writeDir>/...`
    // references: the listing group is the SOURCE's write dir (listed
    // through the parent, never a recursive walk of the namespace) and
    // the length keys are re-prefixed back to the carried form so the
    // partitions rollup reports REAL bytes for carried rows too
    // (review pass 3, round 12)
    data.map { r =>
      val parts = r.file.split('/')
      if (parts.head == "..") parts.take(3).mkString("/") else parts.head
    }.distinct.flatMap { g =>
      val lens = GraftLakeTable.fileLengthsUnder(fs,
        new Path(GraftLakeTable.resolveFile(dir, g)))
      val prefix = g.split('/').dropRight(1).mkString("/")
      if (prefix.isEmpty) lens
      else lens.map { case (k, v) => (s"$prefix/$k", v) }
    }.toMap
  }
}

private[graft] object GraftMetaTable {
  val kinds: Set[String] = Set("history", "files", "partitions", "partitions_history")

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
    case "partitions_history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      // NULL once VACUUM reclaimed a version's unreferenced files
      StructField("bytes", LongType, nullable = true)))
    case other =>
      throw new IllegalStateException(s"unknown metadata table kind '$other'")
  }
}
