package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{FieldReference, LiteralValue, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Group-based (copy-on-write) row-level operations for the graft lake
  * — the engine behind SQL `MERGE INTO` / `UPDATE` (and the non-metadata
  * `DELETE` fallback) through [[GraftCatalog]] (K32).
  *
  * Spark's analyzer rewrites the DML statement over a
  * `SupportsRowLevelOperations` table into `ReplaceData`: the
  * operation's SCAN reads the affected groups, the rewritten query
  * computes those groups' post-DML rows (updated + carried-over +
  * inserted), and the operation's WRITE replaces exactly the groups the
  * scan read. Here a group = one immutable parquet FILE:
  *
  *  1. SNAPSHOT — the operation pins the latest committed manifest
  *     version once; every scan it builds and the final commit reason
  *     about that one file list (a query never sees two snapshots).
  *  2. GROUP FILTER — the scan implements
  *     [[SupportsRuntimeV2Filtering]] over the table's stats columns.
  *     Spark's `RowLevelOperationRuntimeGroupFiltering` runs a
  *     subquery for the DISTINCT stat-column values of target rows
  *     matching the ON/WHERE condition and hands them back as IN
  *     predicates; [[GraftGroupScan.filter]] intersects them with the
  *     manifest's per-file min/max stats ([[GraftLakeTable.fileStats]])
  *     and restricts the scan to the files that can hold a matching
  *     row. Files without stats stay touched — pruning is always
  *     CONSERVATIVE, so a missed prune rewrites more files, never
  *     loses rows. Spark does NOT re-apply the runtime predicate
  *     row-wise (it lives in `BatchScanExec.runtimeFilters` only), so
  *     non-matching rows of touched files flow through as carry-over —
  *     exactly the group contract (pinned by a hand-data spec in
  *     Round21Spec).
  *  3. COMMIT — the write lands the rewritten groups' rows in a fresh
  *     immutable `data_<writer>` dir through Spark's own parquet
  *     `FileWrite` (executor-parallel, stock committer), then publishes
  *     ONE manifest version: untouched files CARRIED BY REFERENCE
  *     (row counts and stats preserved, zero data movement) + the new
  *     files. The optimistic loop commits at `basedOn + 1` and retries
  *     on a lost race; if a racing committer REMOVED one of this
  *     operation's touched files, the merge was computed against a
  *     stale group and ABORTS (write-serializable isolation — the
  *     Delta/Iceberg conflict contract; concurrent APPENDs commute and
  *     proceed).
  *
  * At 100 TB the data cost is `touched files × rewrite`, the metadata
  * cost one manifest read per commit attempt; the group-filter
  * subquery collects DISTINCT stat-column values of matching rows on
  * the driver, so for very-high-cardinality merge keys disable
  * `spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled`
  * and take the full-snapshot rewrite instead.
  */
private[graft] class GraftRowLevelOperation(
    cmd: RowLevelOperation.Command,
    dir: String,
    tableSchema: StructType,
    private[graft] val bucketSpec: Option[(String, Int)] = None,
    private[graft] val specId: Long = 0L)
  extends RowLevelOperation {

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  /** The pinned snapshot: latest committed version at operation build. */
  private[graft] val snapshotVersion: Long =
    ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
  private[graft] val snapshotRows: Seq[GraftLakeTable.ManifestRow] =
    if (snapshotVersion == 0L) Seq.empty
    else GraftLakeTable.manifestRowsFull(spark, manBase, snapshotVersion)

  /** Table-dir-relative paths of the files this operation REPLACES.
    * Defaults to the whole snapshot (correct when runtime filtering
    * never fires — the scan then read everything); the group filter
    * narrows it. Written once by [[GraftGroupScan.filter]] before the
    * write commits (the filter values must be materialized before the
    * filtered scan can execute).
    */
  @volatile private[graft] var replacedFiles: Set[String] =
    snapshotRows.map(_.file).toSet

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftGroupScan(this, dir, tableSchema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new GraftReplaceWrite(
        GraftRowLevelOperation.this, dir, info)
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, $dir, v$snapshotVersion)"
}

/** The row-level scan: Spark's own vectorized parquet scan over the
  * operation's (possibly group-filtered) file list. `toBatch` rebuilds
  * the inner [[ParquetTable]] scan from the CURRENT effective list —
  * `BatchScanExec` re-invokes it after `filter`, which is how the
  * runtime-pruned list takes effect.
  */
private[graft] class GraftGroupScan(
    op: GraftRowLevelOperation,
    dir: String,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends Scan with SupportsRuntimeV2Filtering {

  private def spark: SparkSession = SparkSession.active

  @volatile private var effective: Seq[GraftLakeTable.ManifestRow] = op.snapshotRows

  override def readSchema(): StructType = tableSchema

  /** ONE stat-bearing column, the most merge-key-like (name ending in
    * key/id wins, else the first orderable column). Declaring several
    * makes Spark build the pruning key as a `named_struct` of all of
    * them, which `translateRuntimeFilterV2` cannot turn into a V2
    * predicate — the runtime filter is then silently dropped and every
    * merge degrades to a full-snapshot rewrite. One bare column keeps
    * the subquery translatable (`col IN (matching values)`), which is
    * the equi-merge case worth pruning.
    */
  override def filterAttributes(): Array[NamedReference] = {
    val cols = GraftLakeTable.statColumns(tableSchema).map(_.name)
    val (keys, rest) = cols.partition(_.toLowerCase.matches(".*(key|id)$"))
    (keys ++ rest).take(1).map(FieldReference.column).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val byName = tableSchema.fields.map(f => f.name -> f.dataType).toMap
    var files = effective
    predicates.foreach { p =>
      GraftGroupScan.inValues(p).foreach { case (colName, values) =>
        byName.get(colName).foreach { dt =>
          files = files.filter { row =>
            row.stats.get(colName) match {
              case Some(Seq(mn, mx)) =>
                values.exists(v => GraftGroupScan.mayContain(dt, mn, mx, v))
              case _ => true // no stats for this column/file: keep it
            }
          }
        }
      }
    }
    effective = files
    op.replacedFiles = files.map(_.file).toSet
  }

  override def toBatch: Batch = {
    val paths = effective.map(r => GraftLakeTable.resolveFile(dir, r.file))
    // the row-level scan never reports bucket partitioning (the merge
    // query's own joins decide their distribution), so the plain
    // parquet delegation reads bucketed and flat tables alike — the
    // bucket id lives only in directory names the file index ignores
    // under an explicit schema
    ParquetTable("graft-rlo-scan", spark, options, paths,
      Some(tableSchema), classOf[ParquetFileFormat])
      .newScanBuilder(options).build().toBatch
  }

  override def description(): String =
    s"GraftGroupScan(${op.description()}, files=${effective.size})"
}

private[graft] object GraftGroupScan {

  /** Decode a runtime `IN` (or single-value `=`) predicate into
    * (column, literal values); anything else yields no pruning.
    */
  private[graft] def inValues(p: Predicate): Option[(String, Seq[Any])] =
    p.name() match {
      case "IN" | "=" =>
        p.children().toSeq match {
          case (f: NamedReference) +: rest
              if f.fieldNames().length == 1 &&
                rest.nonEmpty && rest.forall(_.isInstanceOf[LiteralValue[_]]) =>
            Some((f.fieldNames()(0),
              rest.map(_.asInstanceOf[LiteralValue[_]].value)))
          case _ => None
        }
      case _ => None
    }

  /** Compare a literal against one string-cast stat value under the
    * column's type: BigDecimal for numerics (NaN/Infinity fail the
    * parse → None), unsigned UTF-8 bytes for strings (Spark's own
    * string order — NOT Java's UTF-16 compareTo), ISO form for dates
    * (the runtime literal is days-since-epoch). None = incomparable —
    * every caller must treat it as "cannot prune".
    */
  private[graft] def cmpStat(dt: DataType, v: Any, stat: String): Option[Int] =
    try {
      dt match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | _: DecimalType =>
          val x = new java.math.BigDecimal(String.valueOf(v match {
            case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
            case other => other
          }))
          Some(x.compareTo(new java.math.BigDecimal(stat)))
        case StringType =>
          val b = v match {
            case s: UTF8String => s.getBytes
            case s => String.valueOf(s).getBytes("UTF-8")
          }
          Some(utf8Compare(b, stat.getBytes("UTF-8")))
        case DateType =>
          val iso = v match {
            case i: Integer => java.time.LocalDate.ofEpochDay(i.longValue()).toString
            case l: java.lang.Long => java.time.LocalDate.ofEpochDay(l).toString
            case d: java.sql.Date => d.toLocalDate.toString
            case d: java.time.LocalDate => d.toString
            case other => java.time.LocalDate.ofEpochDay(
              String.valueOf(other).toLong).toString
          }
          Some(iso.compareTo(stat))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Conservative range test of one literal against a file's
    * string-cast [min, max]: any parse surprise keeps the file
    * touched.
    */
  private[graft] def mayContain(dt: DataType, mn: String, mx: String, v: Any): Boolean =
    (cmpStat(dt, v, mn), cmpStat(dt, v, mx)) match {
      case (Some(lo), Some(hi)) => lo >= 0 && hi <= 0
      case _ => true
    }

  private def utf8Compare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Can `file` (with stats) possibly hold a row matching the V1
    * filter? `false` ONLY when provably empty — the K35/K14 min/max
    * pruning law: unknown columns, missing stats, unsupported shapes
    * all answer `true`.
    */
  private[graft] def mayMatch(schema: StructType,
                              stats: Map[String, Seq[String]],
                              f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    val byName = schema.fields.map(x => x.name -> x.dataType).toMap
    def range(a: String): Option[(DataType, String, String)] =
      for (dt <- byName.get(a); s <- stats.get(a); if s.length == 2)
        yield (dt, s(0), s(1))
    f match {
      case EqualTo(a, v) =>
        range(a).forall { case (dt, mn, mx) => mayContain(dt, mn, mx, v) }
      case In(a, vs) =>
        range(a).forall { case (dt, mn, mx) =>
          vs.exists(v => mayContain(dt, mn, mx, v)) }
      case GreaterThan(a, v) =>
        range(a).forall { case (dt, _, mx) =>
          cmpStat(dt, v, mx).forall(_ < 0) }
      case GreaterThanOrEqual(a, v) =>
        range(a).forall { case (dt, _, mx) =>
          cmpStat(dt, v, mx).forall(_ <= 0) }
      case LessThan(a, v) =>
        range(a).forall { case (dt, mn, _) =>
          cmpStat(dt, v, mn).forall(_ > 0) }
      case LessThanOrEqual(a, v) =>
        range(a).forall { case (dt, mn, _) =>
          cmpStat(dt, v, mn).forall(_ >= 0) }
      case And(l, r) => mayMatch(schema, stats, l) && mayMatch(schema, stats, r)
      case Or(l, r) => mayMatch(schema, stats, l) || mayMatch(schema, stats, r)
      case _ => true // IsNull/Not/string ops/unknown: never prune on them
    }
  }

  /** Does EVERY row of `file` (with stats + the K53 null counts)
    * provably match the V1 filter? `true` ONLY when provable — the K56
    * metadata-DELETE law, the exact dual of [[mayMatch]]: unknown
    * columns, missing stats, files with nulls in a referenced column
    * (a null row never satisfies a non-null-safe predicate, but would
    * vanish with the file), unsupported shapes all answer `false` and
    * fall back to the rewrite path. Monotone-safe: a wrong `false`
    * costs a rewrite, never a row.
    */
  private[graft] def mustMatchAll(schema: StructType,
                                  stats: Map[String, Seq[String]],
                                  nRows: Long,
                                  f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    val byName = schema.fields.map(x => x.name -> x.dataType).toMap
    def range(a: String): Option[(DataType, String, String)] =
      for (dt <- byName.get(a); s <- stats.get(a); if s.length == 2)
        yield (dt, s(0), s(1))
    def nullCount(a: String): Option[Long] =
      stats.get(s"__nulls#$a").flatMap(_.headOption).flatMap(_.toLongOption)
    def noNulls(a: String): Boolean = nullCount(a).contains(0L)
    f match {
      case EqualTo(a, v) => noNulls(a) && range(a).exists {
        case (dt, mn, mx) =>
          cmpStat(dt, v, mn).contains(0) && cmpStat(dt, v, mx).contains(0) }
      case In(a, vs) => noNulls(a) && range(a).exists {
        case (dt, mn, mx) =>
          cmpStat(dt, mn, mx).map(_ == 0).getOrElse(false) &&
            vs.exists(v => cmpStat(dt, v, mn).contains(0)) }
      case GreaterThan(a, v) => noNulls(a) && range(a).exists {
        case (dt, mn, _) => cmpStat(dt, v, mn).exists(_ < 0) }
      case GreaterThanOrEqual(a, v) => noNulls(a) && range(a).exists {
        case (dt, mn, _) => cmpStat(dt, v, mn).exists(_ <= 0) }
      case LessThan(a, v) => noNulls(a) && range(a).exists {
        case (dt, _, mx) => cmpStat(dt, v, mx).exists(_ > 0) }
      case LessThanOrEqual(a, v) => noNulls(a) && range(a).exists {
        case (dt, _, mx) => cmpStat(dt, v, mx).exists(_ >= 0) }
      case IsNotNull(a) => noNulls(a)
      case IsNull(a) => nullCount(a).contains(nRows) && nRows > 0L
      case And(l, r) =>
        mustMatchAll(schema, stats, nRows, l) &&
          mustMatchAll(schema, stats, nRows, r)
      case Or(l, r) =>
        mustMatchAll(schema, stats, nRows, l) ||
          mustMatchAll(schema, stats, nRows, r)
      case _: AlwaysTrue => true
      case _ => false
    }
  }
}

/** The replace-groups write: rewritten rows land in a fresh immutable
  * data dir via Spark's own parquet `FileWrite` (stock committer,
  * executor-parallel); `commit` then publishes ONE manifest version =
  * carried-by-reference untouched files + the new files, through the
  * same optimistic loop as INSERT, with the concurrent-removal abort
  * described on [[GraftRowLevelOperation]].
  */
private[graft] class GraftReplaceWrite(
    op: GraftRowLevelOperation,
    dir: String,
    info: LogicalWriteInfo)
  extends Write
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  private def spark: SparkSession = SparkSession.active
  private val writerId = java.util.UUID.randomUUID().toString.take(12)
  private val dataDir = s"$dir/data_$writerId"

  /** Bucketed tables ask Spark to CLUSTER the rewritten rows by the
    * bucket transform before the write (the Iceberg write-distribution
    * contract; the transform resolves through the catalog's own
    * `bucket` function, the same machinery SPJ reads use) — each
    * bucket then lands in exactly ONE task, so the single-pass router
    * writes one file per bucket instead of task-count × bucket files.
    * Flat tables leave the distribution unspecified.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    op.bucketSpec match {
      case Some((col, n)) =>
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          Array(GraftLakeTable.bucketTransform(n, col)))
      case None =>
        org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    }

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = Array.empty

  override def requiredNumPartitions(): Int = 0

  override def toBatch: BatchWrite = op.bucketSpec match {
    // bucketed table: SINGLE-PASS bucket-routed write — each task
    // computes the bucket id per row and streams it straight into a
    // final per-bucket parquet file (no Hadoop commit protocol: the
    // manifest gates visibility, so files are written at their final
    // paths and only the files a COMMITTED task attempt reported are
    // registered — the Iceberg commit shape; a speculative attempt's
    // duplicates stay unreferenced until VACUUM). Replaces the old
    // two-pass read-back-and-re-route, saving one full read+write of
    // the touched groups on every bucketed MERGE/UPDATE.
    case Some((col, n)) =>
      GraftBucketRoutedBatchWrite.batchWrite(
        spark, dataDir, info.schema(), col, n) { files =>
        GraftLakeTable.commitReplace(spark, dir, dataDir, op.replacedFiles,
          info.schema(), bucketed = true, op.description(),
          onlyFiles = Some(files), specId = op.specId)
      }

    case None => new BatchWrite {
      private val inner: BatchWrite =
        ParquetTable("graft-rlo-write", spark, CaseInsensitiveStringMap.empty(),
          Seq(dataDir), Some(info.schema()), classOf[ParquetFileFormat])
          .newWriteBuilder(info).build().toBatch

      // ReplaceData's physical rows lead with Spark's internal
      // `__row_operation` INT column (RowDeltaUtils.WRITE_OPERATION);
      // with no metadata attributes declared Spark hands the raw rows to
      // the writer (DataWritingSparkTask does not project), so the
      // connector strips the marker itself before the parquet writer
      override def createBatchWriterFactory(
          pInfo: PhysicalWriteInfo): DataWriterFactory =
        new GraftOpStrippingWriterFactory(
          inner.createBatchWriterFactory(pInfo), info.schema())

      override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        inner.commit(messages)
        GraftLakeTable.commitReplace(spark, dir, dataDir, op.replacedFiles,
          info.schema(), bucketed = false, op.description(), specId = op.specId)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        inner.abort(messages)
    }
  }

  override def description(): String = s"GraftReplaceWrite($dataDir)"
}

/** The single-pass bucket router: parquet files open lazily per
  * bucket id inside each task (bounded by the table's bucket count;
  * rows need not arrive clustered) at their FINAL paths
  * `data_<writer>/__graft_bucket=<b>/part-<pid>-<tid>.parquet`, and
  * the task's commit message lists exactly the files it wrote. The
  * bucket id mirrors `pmod(hash(key), n)` including Spark's
  * hash(NULL) = seed convention, so routed files interoperate
  * bit-for-bit with [[GraftLakeTable.writeData]]'s directory
  * partitioning and the SPJ read path.
  */
private[graft] object GraftBucketRoutedBatchWrite {
  /** The shared bucket-routed [[BatchWrite]] shell — single-pass
    * router, manifest-gated visibility (files written at FINAL paths;
    * only COMMITTED tasks' reported files reach `commitFiles`), no
    * coordinator ask. The row-level replace (K32/K34) and the K46
    * bucketed append differ only in the commit they publish.
    */
  def batchWrite(spark: SparkSession, dataDir: String, dataSchema: StructType,
                 bucketCol: String, nBuckets: Int)
                (commitFiles: Seq[String] => Unit): BatchWrite = new BatchWrite {
    private val routed = new GraftBucketRoutedBatchWrite(
      spark, dataDir, dataSchema, bucketCol, nBuckets)

    override def createBatchWriterFactory(
        pInfo: PhysicalWriteInfo): DataWriterFactory =
      routed.writerFactory()

    // file visibility is message-gated, not committer-gated — no
    // coordinator ask needed (and none would be answered twice)
    override def useCommitCoordinator(): Boolean = false

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      commitFiles(messages
        .collect { case m: GraftBucketCommitMessage => m.files.toSeq }.flatten.toSeq)

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val p = new org.apache.hadoop.fs.Path(dataDir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}

private[graft] class GraftBucketRoutedBatchWrite(
    spark: SparkSession,
    dataDir: String,
    dataSchema: StructType,
    bucketCol: String,
    nBuckets: Int) {

  // prepareWrite configures the job conf the executor-side
  // TaskAttemptContexts must carry (ParquetWriteSupport schema etc.)
  private val (factory, serConf) = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val f = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, dataSchema)
    (f, new org.apache.spark.util.SerializableConfiguration(job.getConfiguration))
  }

  def writerFactory(): DataWriterFactory =
    new GraftBucketRoutedWriterFactory(factory, serConf, dataDir, dataSchema,
      dataSchema.fieldIndex(bucketCol), nBuckets)
}

private[graft] case class GraftBucketCommitMessage(files: Array[String])
  extends WriterCommitMessage

private[graft] class GraftBucketRoutedWriterFactory(
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    serConf: org.apache.spark.util.SerializableConfiguration,
    dataDir: String,
    dataSchema: StructType,
    keyIdx: Int,
    nBuckets: Int)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
      import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

      private val ctx = new TaskAttemptContextImpl(
        new org.apache.hadoop.conf.Configuration(serConf.value),
        new TaskAttemptID(
          new TaskID(new JobID("graftBucketRoute", partitionId), TaskType.MAP,
            partitionId), 0))
      private val ext = factory.getFileExtension(ctx)
      private val open = new java.util.HashMap[
        Int, org.apache.spark.sql.execution.datasources.OutputWriter]()
      private val written = scala.collection.mutable.ArrayBuffer[String]()
      private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        dataSchema, 1 to dataSchema.length)

      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        // strip ReplaceData's leading __row_operation marker (see the
        // flat path's stripping factory)
        val r = if (row.numFields == dataSchema.length) row
                else { proj.project(row); proj }
        // hash(NULL) leaves the seed (42) untouched — mirror it
        val b =
          if (r.isNullAt(keyIdx)) ((42 % nBuckets) + nBuckets) % nBuckets
          else GraftBucketed.bucketId(r.getLong(keyIdx), nBuckets)
        var w = open.get(b)
        if (w == null) {
          val path = s"$dataDir/${GraftBucketed.BucketDirPrefix}$b/" +
            s"part-$partitionId-$taskId$ext"
          w = factory.newInstance(path, dataSchema, ctx)
          open.put(b, w)
          written += path
        }
        w.write(r)
      }

      override def commit(): WriterCommitMessage = {
        open.values().forEach(_.close())
        GraftBucketCommitMessage(written.toArray)
      }

      override def abort(): Unit = {
        open.values().forEach(w =>
          try w.close() catch { case _: Exception => () })
        val fs = new org.apache.hadoop.fs.Path(dataDir)
          .getFileSystem(serConf.value)
        written.foreach(p =>
          try fs.delete(new org.apache.hadoop.fs.Path(p), false)
          catch { case _: Exception => () })
      }

      override def close(): Unit = ()
    }
}

/** Strips the leading `__row_operation` marker off ReplaceData rows
  * before the delegate (parquet) writer sees them; rows already in the
  * data shape pass through untouched.
  */
private class GraftOpStrippingWriterFactory(
    inner: DataWriterFactory, dataSchema: StructType)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val delegate = inner.createWriter(partitionId, taskId)
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
      dataSchema, 1 to dataSchema.length)
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == dataSchema.length) delegate.write(row)
        else { proj.project(row); delegate.write(proj) }
      override def commit(): WriterCommitMessage = delegate.commit()
      override def abort(): Unit = delegate.abort()
      override def close(): Unit = delegate.close()
    }
  }
}
