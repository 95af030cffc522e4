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
class GraftMicroBatchStream(
    dir: String,
    readSchema: StructType,
    ignoreChanges: Boolean,
    startingVersion: Option[Long] = None,
    maxFilesPerTrigger: Option[Int] = None,
    followRef: Option[String] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  /** E42: `followRef => '<branch-or-tag>'` pins the stream's admission
    * CEILING to the ref's current version, re-resolved at every poll —
    * the WAP-aware subscriber: a corrupt batch that commits on the
    * table but never fast-forwards `main` is never delivered
    * downstream; when the audit publishes (one ref flip, K55) the
    * stream picks up exactly the published versions. A ref rolled
    * BACK below the checkpointed offset makes the stream WAIT (no
    * re-delivery, offsets never regress); a dropped ref fails the
    * poll with K55's named remedy. Cost per poll: one ref-lake read
    * on top of the manifest listing — still metadata-only.
    */
  private def refCeiling(): Option[Long] =
    followRef.map(n =>
      graft.sinks.RefStore.resolve(spark, s"$dir/refs", n)._2)

  /** Committed manifests are IMMUTABLE, so each version's file set is
    * read once per stream and cached (bounded LRU) — the admission
    * loop's per-candidate diffs cost one manifest read each for the
    * stream's lifetime, not one per trigger. A version missing from
    * the committed list (a checkpointed offset swept by VACUUM
    * retention) fails with a NAMED out-of-retention error instead of
    * a raw missing-path read error.
    */
  private val manifestCache =
    new java.util.LinkedHashMap[Long, Set[String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Set[String]]): Boolean = size() > 64
    }

  private def filesAt(v: Long): Set[String] =
    if (v == 0L) Set.empty
    else manifestCache.synchronized {
      val hit = manifestCache.get(v)
      if (hit != null) hit
      else {
        val files = GraftLakeTable.filesAtRetained(spark, manBase, v,
          s"streaming source over $dir").toSet
        manifestCache.put(v, files)
        files
      }
    }

  /** `startingVersion = v` means "deliver v and everything after" —
    * the Delta backfill-replay option; the default streams the whole
    * history (offset 0 = before the first commit).
    */
  override def initialOffset(): Offset = {
    startingVersion.foreach(v => require(v >= 1,
      s"startingVersion must be >= 1 (versions start at 1; got $v — " +
        "omit the option to stream the whole history)"))
    GraftVersionOffset(startingVersion.map(_ - 1).getOrElse(0L))
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(start, limit) is the admission-control entry point")

  /** Rate limiting at VERSION granularity (offsets are versions, a
    * version's files commit atomically — Delta's maxFilesPerTrigger
    * shape): advance the end version while the accumulated ADDED-file
    * count stays within the limit, always admitting at least one
    * version so a single fat commit cannot stall the stream.
    * AvailableNow pins the drain target at prepare time.
    */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val committed = ManifestStore.versions(spark, manBase)
    val ceiling = math.min(
      availableNowTarget.getOrElse(committed.lastOption.getOrElse(0L)),
      refCeiling().getOrElse(Long.MaxValue))
    val candidates = committed.filter(v => v > s && v <= ceiling)
    if (candidates.isEmpty) return GraftVersionOffset(math.max(s, 0L))
    val cap = limit match {
      case f: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        Some(f.maxFiles())
      case _ => maxFilesPerTrigger
    }
    cap match {
      case None => GraftVersionOffset(candidates.last)
      case Some(maxF) =>
        var admitted = s
        var files = 0
        var prev = filesAt(s)
        var i = 0
        while (i < candidates.length) {
          val v = candidates(i)
          val cur = filesAt(v)
          val added = (cur -- prev).count(f => !GraftDeltaOperation.isDeleteFile(f))
          if (admitted == s || files + added <= maxF) {
            admitted = v; files += added; prev = cur; i += 1
          } else i = candidates.length
        }
        GraftVersionOffset(admitted)
    }
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles)
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(math.min(
      ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L),
      refCeiling().getOrElse(Long.MaxValue)))

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
    scanOver(filesAt(ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L))
      .filterNot(GraftDeltaOperation.isDeleteFile).toSeq.sorted)
      .toBatch.createReaderFactory()

  private def scanOver(relFiles: Seq[String]): Scan = {
    val builder = ParquetTable("graft-stream-source", spark,
      CaseInsensitiveStringMap.empty(),
      relFiles.map(f => GraftLakeTable.resolveFile(dir, f)),
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

  override def build(): Scan = {
    val built = inner.build()
    // K49: the scan reports manifest-fed statistics over the
    // POST-PUSHDOWN file list (read after inner.build() runs the
    // stat-prune), so the planner sees exact rows + on-disk bytes and
    // can auto-broadcast a small (or small-after-pruning) lake table
    val statsRows = inner match {
      case p: GraftPrunedScanBuilder => p.builtSurvivors
      case _ => Nil
    }
    GraftLakeScan(built, dir, requested,
      ignoreChanges = options.getBoolean("ignoreChanges", false),
      startingVersion = Option(options.get("startingVersion")).map(_.toLong),
      maxFilesPerTrigger = Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      followRef = Option(options.get("followRef")),
      statsRows = statsRows)
}
}

/** A case class (NOT an anonymous Scan) so exchange/scan-reuse keeps
  * working off value equality, and plan inspectors can unwrap to the
  * inner parquet scan.
  */
case class GraftLakeScan(inner: Scan, dir: String,
                         requested: StructType,
                         ignoreChanges: Boolean,
                         startingVersion: Option[Long],
                         maxFilesPerTrigger: Option[Int],
                         followRef: Option[String] = None,
                         statsRows: Seq[GraftLakeTable.ManifestRow] = Nil)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(dir, requested, ignoreChanges,
      startingVersion, maxFilesPerTrigger, followRef)
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    if (statsRows.nonEmpty) GraftManifestStats.of(statsRows, readSchema())
    else inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
      }
    }
  override def description(): String = inner.description()
}
