package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delta-based (merge-on-read) row-level operations for the graft lake
  * — K39, the other half of the Delta/Iceberg row-level design space
  * next to K32's group-based copy-on-write:
  *
  *   - DML (DELETE / UPDATE / MERGE) on a merge-on-read table writes
  *     EQUALITY-DELETE files (the affected rows' key values) plus new
  *     data files for inserted/updated rows, and commits ONE manifest
  *     version carrying every pre-existing file BY REFERENCE — a
  *     committed data file is never rewritten, so a DML touching 100
  *     rows of a 100 TB table costs ~100 rows of IO, not `touched
  *     files × rewrite` (the write-amplification trade copy-on-write
  *     makes the other way).
  *   - Reads apply the deletes: an equality-delete file masks its keys
  *     out of data files with a STRICTLY SMALLER commit sequence
  *     number (`ManifestRow.seq` — the Iceberg data-sequence-number
  *     rule), which is exactly what lets one commit delete key k from
  *     old files and reinsert k in its own new file (UPDATE's shape
  *     under `representUpdateAsDeleteAndInsert`).
  *
  * Spark drives the whole flow through [[SupportsDelta]]: the analyzer
  * rewrites the statement into `WriteDelta`, projects each output row
  * into (operation, row-id [, row]) and calls the
  * [[org.apache.spark.sql.connector.write.DeltaWriter]]'s
  * delete/insert/reinsert — both sinks below are Spark's own parquet
  * `FileWrite` writers (executor-parallel, stock committer), one over
  * an immutable `data_<writer>` dir, one over `deletes_<writer>`.
  *
  * Scale/limits, stated:
  *   - The row id is a declared BIGINT key column (equality deletes),
  *     not positional deletes — rows whose key is NULL can never be
  *     masked (SQL equality), and key uniqueness is the user's
  *     contract exactly as in Iceberg equality deletes.
  *   - A read loads the un-compacted delete keys DRIVER-side and
  *     ships them in the reader factory — bounded by deletes since
  *     the last compaction (the Iceberg per-task equality-delete
  *     load, centralized). `CALL system.optimize` refuses on a table
  *     with live delete files rather than resurrect masked rows;
  *     INSERT OVERWRITE (or a MERGE rewriting everything) compacts.
  *   - MoR reads with live deletes run row-based (no columnar batch) —
  *     the masked scan trades vectorization for zero write
  *     amplification; a delete-free snapshot reads on the stock
  *     vectorized path, pruning included.
  *   - Commits are STRICTLY serialized against the pinned snapshot
  *     (`tryPublish` at exactly snapshot+1, no retry): a concurrent
  *     commit of ANY kind aborts the statement — equality deletes
  *     don't commute with concurrent inserts of matching keys, so
  *     the safe default is to re-run against the new snapshot.
  */
private[graft] class GraftDeltaOperation(
    cmd: RowLevelOperation.Command,
    dir: String,
    tableSchema: StructType,
    keyCol: String)
  extends RowLevelOperation with SupportsDelta {

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  /** The pinned snapshot: latest committed version at operation build. */
  private[graft] val snapshotVersion: Long =
    ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
  private[graft] val snapshotRows: Seq[GraftLakeTable.ManifestRow] =
    if (snapshotVersion == 0L) Seq.empty
    else GraftLakeTable.manifestRowsFull(spark, manBase, snapshotVersion)

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(FieldReference.column(keyCol))

  /** UPDATE arrives as delete(old id) + reinsert(new row) — the writer
    * then has exactly two sinks (delete keys, data rows) and the
    * one-commit delete-then-reinsert ordering is what the seq rule
    * makes correct.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** The operation's scan is the table's own merge-on-read scan over
    * the pinned snapshot — the DML must see already-masked rows as
    * absent (deleting a deleted row is a no-op, not a resurrection).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GraftDeltaOperation.morScanBuilder(spark, s"graft-delta-scan",
      dir, snapshotRows, tableSchema, keyCol, options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(GraftDeltaOperation.this, dir, tableSchema, keyCol, info)
    }

  override def description(): String =
    s"GraftDeltaOperation($cmd, $dir, v$snapshotVersion, rowId=$keyCol)"
}

private[graft] object GraftDeltaOperation {

  /** A K51/K52 transaction workspace carries source files as
    * `../<table>/<rel>` references — classification must look at the
    * path UNDER the carry prefix, or a carried equality-delete file
    * reads as a data file in the workspace and its masked rows
    * resurrect (the hazard that kept MoR tables out of transactions
    * until r14 #5). Plain rows pass through unchanged.
    */
  private[graft] def carryLocal(rel: String): String =
    if (rel.startsWith("../")) {
      val i = rel.indexOf('/', 3)
      if (i < 0) rel else rel.substring(i + 1)
    } else rel

  /** Relative manifest paths of delete files — K39's equality deletes
    * AND K42's position deletes (one table only ever has one kind, but
    * every mode-agnostic consumer — metadata tables, VACUUM liveness,
    * OPTIMIZE's resurrection guard, the streaming source's non-append
    * detection — must treat both as "this version deletes rows").
    * Carried `../<table>/` references classify by their local path.
    */
  private[graft] def isDeleteFile(rel: String): Boolean = {
    val local = carryLocal(rel)
    local.startsWith("deletes_") || GraftPosMeta.isPosDeleteFile(local)
  }

  /** Equality-delete files only (the K39 masked-scan grouping). */
  private[graft] def isEqDeleteFile(rel: String): Boolean =
    carryLocal(rel).startsWith("deletes_")

  /** The merge-on-read scan builder over a resolved snapshot: data
    * files are grouped by WHICH delete files apply to them (all delete
    * files with a strictly larger seq), each group scans through the
    * stock manifest-stats-pruned parquet builder, and a wrapping
    * reader masks the group's deleted keys row-wise. A snapshot with
    * no delete files degrades to the plain pruned scan — stock
    * vectorized path, zero overhead.
    */
  def morScanBuilder(spark: SparkSession, tableName: String, dir: String,
                     rows: Seq[GraftLakeTable.ManifestRow],
                     tableSchema: StructType, keyCol: String,
                     options: CaseInsensitiveStringMap): ScanBuilder = {
    val (delRows, dataRows) = rows.partition(r => isEqDeleteFile(r.file))
    if (delRows.isEmpty)
      return new GraftPrunedScanBuilder(spark, tableName, dir, dataRows,
        tableSchema, options)
    val keySchema = StructType(Seq(StructField(keyCol, LongType)))
    // delete keys per COMMIT seq (driver-side: bounded by un-compacted
    // deletes; NULL keys can never equality-match and are dropped)
    val bySeq: Seq[(Long, Array[Long])] = delRows.groupBy(_.seq).toSeq
      .map { case (s, rs) =>
        (s, spark.read.schema(keySchema)
          .parquet(rs.map(r => GraftLakeTable.resolveFile(dir, r.file)): _*)
          .where(org.apache.spark.sql.functions.col(s"`$keyCol`").isNotNull)
          .collect().map(_.getLong(0)))
      }.sortBy(_._1)
    val delSeqs = bySeq.map(_._1)
    val groups: Seq[(Seq[GraftLakeTable.ManifestRow], Array[Long])] =
      dataRows.groupBy(dr => delSeqs.count(_ > dr.seq)).toSeq.sortBy(_._1)
        .map { case (_, rs) =>
          val applicable = bySeq.filter(_._1 > rs.head.seq)
            .flatMap(_._2).distinct.sorted.toArray
          (rs, applicable)
        }
    if (groups.isEmpty)
      new GraftPrunedScanBuilder(spark, tableName, dir, Nil, tableSchema, options)
    else
      // distinct masked keys across every delete file — the exact
      // upper bound on masked rows under the equality-delete key-
      // uniqueness contract, fed to the stats adjustment (r14 #4)
      new GraftMorScanBuilder(spark, tableName, dir, groups, tableSchema,
        keyCol, options,
        deletedKeys = bySeq.flatMap(_._2).distinct.length.toLong)
  }
}

/** Pushdown-preserving wrapper over one [[GraftPrunedScanBuilder]] per
  * delete-applicability group: column pruning and filter pushdown are
  * forwarded to every group (they share format and schema, so the
  * pushdown answers are identical), with the row-id key column FORCED
  * into the read schema — the masking reader needs it even when the
  * query pruned it away, and projects it back out afterwards.
  */
private[graft] class GraftMorScanBuilder(
    spark: SparkSession,
    tableName: String,
    dir: String,
    groups: Seq[(Seq[GraftLakeTable.ManifestRow], Array[Long])],
    tableSchema: StructType,
    keyCol: String,
    options: CaseInsensitiveStringMap,
    deletedKeys: Long = 0L)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownCatalystFilters {

  private val builders = groups.map { case (rs, _) =>
    new GraftPrunedScanBuilder(spark, tableName, dir, rs, tableSchema, options)
  }
  private var requested: StructType = tableSchema

  private def withKey(s: StructType): StructType =
    if (s.fieldNames.contains(keyCol)) s
    else s.add(tableSchema(keyCol))

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requested = requiredSchema
    builders.foreach(_.pruneColumns(withKey(requiredSchema)))
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val results = builders.map(_.pushFilters(filters))
    results.head
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    builders.head.pushedFilters

  override def build(): Scan = {
    val augmented = withKey(requested)
    val scans = builders.map(_.build())
    // masked-row estimate for the PRUNED survivors, bounded PER FILE
    // by its key-range overlap with the applicable delete keys
    // (review pass 2, round 14): a uniform table-wide pro-rate
    // misattributes file-correlated delete mass — a scan pruned to a
    // delete-free file must subtract ~0, and one pruned to a fully-
    // dead file must subtract ~all of it. The keysets are already
    // driver-side and sorted; each survivor's bound is min(its rows,
    // applicable keys inside its key-col min/max) — exact for
    // range-disjoint files, conservative on overlap, capped at the
    // distinct key total so overlapping ranges can never subtract the
    // same key twice across the sum.
    def keysInRange(ks: Array[Long], lo: Long, hi: Long): Long = {
      def insertion(v: Long, upper: Boolean): Int = {
        val i = java.util.Arrays.binarySearch(ks, v)
        if (i >= 0) (if (upper) i + 1 else i) else -(i + 1)
      }
      math.max(0, insertion(hi, upper = true) - insertion(lo, upper = false)).toLong
    }
    val deletedForSurvivors = builders.zip(groups).map { case (b, (_, ks)) =>
      b.builtSurvivors.map { f =>
        val bound = f.stats.get(keyCol) match {
          case Some(Seq(mn, mx)) =>
            (for (lo <- mn.toLongOption; hi <- mx.toLongOption)
              yield keysInRange(ks, lo, hi)).getOrElse(ks.length.toLong)
          case _ => ks.length.toLong
        }
        math.min(f.nRows, bound)
      }.sum
    }.sum
    new GraftMorScan(scans, groups.map(_._2),
      requested, augmented, augmented.fieldIndex(keyCol),
      statsRows = builders.flatMap(_.builtSurvivors),
      deletedKeys = math.min(deletedKeys, deletedForSurvivors))
  }
}

/** The masked scan: one inner parquet scan per delete-applicability
  * group; partitions are tagged with their group and read through a
  * key-masking row reader. Reports the REQUESTED schema — the reader
  * projects the force-included key back out when the query pruned it.
  */
private[graft] class GraftMorScan(
    scans: Seq[Scan],
    keysets: Seq[Array[Long]],
    out: StructType,
    augmented: StructType,
    keyIdx: Int,
    statsRows: Seq[GraftLakeTable.ManifestRow] = Nil,
    deletedKeys: Long = 0L)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = out

  /** K49 with the r14 delete-mass adjustment: manifest stats over the
    * scan's pruned survivor files MINUS the masked-row estimate the
    * builder derived for exactly those survivors (per-file key-range
    * bounds over the driver-side delete keysets — see
    * [[GraftMorScanBuilder.build]]). Under the key-uniqueness
    * contract equality deletes already rely on, a full scan of
    * range-partitioned files subtracts the exact masked count, so a
    * heavily-deleted dim reports its servable rows/bytes and still
    * broadcasts statically instead of planning at 2× its size.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    GraftManifestStats.of(statsRows, out, deletedRows = deletedKeys)

  override def toBatch: Batch = new Batch {
    private val batches = scans.map(_.toBatch)

    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, g) =>
        b.planInputPartitions().map(p => new GraftMorPartition(p, g): InputPartition)
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory = {
      val projIdx =
        if (out.length == augmented.length) Array.empty[Int]
        else out.fieldNames.map(augmented.fieldIndex)
      new GraftMorReaderFactory(
        batches.map(_.createReaderFactory()).toArray,
        keysets.toArray, keyIdx, out, projIdx)
    }
  }

  override def description(): String =
    s"GraftMorScan(groups=${scans.length}, " +
      s"deleteKeys=${keysets.map(_.length).sum}, rowId=#$keyIdx)"
}

/** An inner group's partition, tagged with its group index. */
private[graft] class GraftMorPartition(val delegate: InputPartition,
                                       val group: Int)
  extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Row-based masking reader factory: rows whose key sits in the
  * group's sorted delete-key array are skipped; NULL keys pass (an
  * equality delete cannot match them). Columnar reads are declined —
  * the mask needs rows — which Spark honors by taking the row path.
  */
private[graft] class GraftMorReaderFactory(
    factories: Array[PartitionReaderFactory],
    keys: Array[Array[Long]],
    keyIdx: Int,
    out: StructType,
    projIdx: Array[Int])
  extends PartitionReaderFactory {

  // NOT per-group columnar: Spark requires every partition of one
  // scan to answer supportColumnarReads identically ("Cannot mix
  // row-based and columnar input partitions"), and a masked scan
  // always has at least one masking group — so the whole scan runs
  // row-based; the vectorized path belongs to delete-free snapshots,
  // which never build this factory at all
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[GraftMorPartition]
    val inner = factories(mp.group).createReader(mp.delegate)
    val ks = keys(mp.group)
    if (ks.isEmpty && projIdx.isEmpty) inner
    else new PartitionReader[InternalRow] {
      private val proj =
        if (projIdx.isEmpty) null
        else org.apache.spark.sql.catalyst.ProjectingInternalRow(out, projIdx.toIndexedSeq)
      private var cur: InternalRow = _

      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (r.isNullAt(keyIdx) ||
              java.util.Arrays.binarySearch(ks, r.getLong(keyIdx)) < 0) {
            cur = r
            return true
          }
        }
        false
      }

      override def get(): InternalRow =
        if (proj == null) cur else { proj.project(cur); proj }

      override def close(): Unit = inner.close()
    }
  }
}

/** The delta write: two stock parquet `FileWrite` sinks — data rows
  * into `data_<writer>`, deleted keys into `deletes_<writer>` — and
  * ONE manifest commit carrying every pre-existing file by reference
  * plus the new data and delete files, strictly serialized against the
  * operation's pinned snapshot (see [[GraftDeltaOperation]]).
  */
private[graft] class GraftDeltaWrite(
    op: GraftDeltaOperation,
    dir: String,
    tableSchema: StructType,
    keyCol: String,
    info: LogicalWriteInfo)
  extends DeltaWrite {

  private def spark: SparkSession = SparkSession.active
  private val writerId = java.util.UUID.randomUUID().toString.take(12)
  private val dataDir = s"$dir/data_$writerId"
  private val deletesDir = s"$dir/deletes_$writerId"
  private val deleteSchema = StructType(Seq(StructField(keyCol, LongType)))

  private def lwi(s: StructType, qid: String): LogicalWriteInfo =
    new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty()
      override def queryId(): String = qid
      override def schema(): StructType = s
      // the interface DEFAULTS throw — a file sink has neither
      override def rowIdSchema(): java.util.Optional[StructType] =
        java.util.Optional.empty()
      override def metadataSchema(): java.util.Optional[StructType] =
        java.util.Optional.empty()
    }

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    // a pure DELETE has an EMPTY row schema (the statement writes no
    // data rows, only ids) — parquet refuses an empty schema, so the
    // data sink only exists when there are rows to land
    private val dataInner: Option[BatchWrite] =
      if (info.schema().isEmpty) None
      else Some(ParquetTable("graft-delta-data", spark, CaseInsensitiveStringMap.empty(),
        Seq(dataDir), Some(info.schema()), classOf[ParquetFileFormat])
        .newWriteBuilder(lwi(info.schema(), info.queryId())).build().toBatch)

    /** The file commit protocol coordinates its own task commits
      * (`SparkHadoopMapRedUtil.commitTask` asks the
      * OutputCommitCoordinator), exactly like Spark's own
      * `FileBatchWrite` — and the coordinator authorizes ONE ask per
      * partition, so the exec must not ask too. This is also why the
      * deleted keys travel in the commit MESSAGES instead of a second
      * file sink: two coordinated file commits in one task means two
      * asks, and the second is denied.
      */
    override def useCommitCoordinator(): Boolean = false

    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftDeltaWriterFactory(
        dataInner.map(_.createBatchWriterFactory(pInfo)).orNull)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val ms = messages.map(_.asInstanceOf[GraftDeltaCommitMessage])
      dataInner.foreach(_.commit(ms.flatMap(_.data)))
      // ONE equality-delete file, written from the aggregated task
      // keys — bounded by this statement's matched rows, the same
      // bound the read path's driver-side delete-key load already has
      val keys = ms.flatMap(_.deletedKeys).distinct
      if (keys.nonEmpty) {
        val session = spark
        import session.implicits._
        keys.toSeq.toDF(keyCol).repartition(1).write.parquet(deletesDir)
      }
      commitManifest()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val ms = messages.collect { case m: GraftDeltaCommitMessage => m }
      dataInner.foreach(_.abort(ms.flatMap(_.data)))
    }
  }

  private def commitManifest(): Unit = {
    val manBase = s"$dir/manifest"
    val txn = spark.conf.getOption(GraftLakeTable.TxnConfKey).getOrElse("")
    val newData = GraftLakeTable.fileStats(spark, dataDir, tableSchema)
    val newDel = GraftLakeTable.fileStats(spark, deletesDir, deleteSchema)
    val basedOn = ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
    if (basedOn != op.snapshotVersion)
      throw new java.io.IOException(
        s"${op.description()}: concurrent commit moved the table to " +
          s"v$basedOn past the pinned v${op.snapshotVersion} — equality " +
          "deletes do not commute with concurrent writes; retry the statement")
    val current = op.snapshotRows
    val manifest = GraftLakeTable.publishRows(spark,
      current.map(_.copy(txn = "")) ++
        (newData ++ newDel).map { case (f, n, st, b) =>
          GraftLakeTable.ManifestRow(f, n, txn, st, basedOn + 1, b) })
    if (!ManifestStore.tryPublish(spark, manBase, manifest, basedOn + 1))
      throw new java.io.IOException(
        s"${op.description()}: lost the commit race at v${basedOn + 1} — " +
          "retry the statement")
  }

  override def description(): String = s"GraftDeltaWrite($dataDir, $deletesDir)"
}

private[graft] case class GraftDeltaCommitMessage(
    data: Option[WriterCommitMessage],
    deletedKeys: Array[Long]) extends WriterCommitMessage

private[graft] class GraftDeltaWriterFactory(
    dataFactory: DataWriterFactory)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // the data sink is LAZY: a task that only deletes creates no
      // data file; deleted keys ride the commit message (see
      // useCommitCoordinator on the batch write for why no second
      // file sink)
      private var dataWriter: DataWriter[InternalRow] = _
      private val deleted = scala.collection.mutable.ArrayBuffer[Long]()

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        // a NULL id can never equality-match a row — nothing to record
        if (!id.isNullAt(0)) deleted += id.getLong(0)

      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        // unreachable under representUpdateAsDeleteAndInsert — kept
        // total so a planner change degrades to the same semantics
        delete(meta, id)
        insert(row)
      }

      override def reinsert(meta: InternalRow, row: InternalRow): Unit = insert(row)

      override def insert(row: InternalRow): Unit = {
        require(dataFactory != null,
          "delta write received a data row for a statement planned without a row schema")
        if (dataWriter == null) dataWriter = dataFactory.createWriter(partitionId, taskId)
        dataWriter.write(row)
      }

      override def commit(): WriterCommitMessage =
        GraftDeltaCommitMessage(
          Option(dataWriter).map(_.commit()), deleted.toArray)

      override def abort(): Unit =
        if (dataWriter != null) dataWriter.abort()

      override def close(): Unit =
        if (dataWriter != null) dataWriter.close()
    }
}
