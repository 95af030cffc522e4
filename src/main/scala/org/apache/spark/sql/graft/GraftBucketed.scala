package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Storage-partitioned (bucketed) catalog tables — K6's co-located
  * join without `saveAsTable` (K34): `CREATE TABLE ... PARTITIONED BY
  * (bucket(N, key))` routes every INSERT's rows into per-bucket files,
  * the scan reports [[KeyGroupedPartitioning]] over the `bucket`
  * transform with one input partition per bucket, and Spark's
  * storage-partitioned join (`spark.sql.sources.v2.bucketing.enabled`)
  * plans an equi-join of two same-bucketed tables with NO Exchange on
  * either side — the co-location story at 100 TB, where the shuffle of
  * the big fact join is the cost being deleted.
  *
  * The bucket id is `pmod(murmur3(key), n)` — computed with Spark's
  * own `hash()` at write time and replayed bit-identically by
  * [[GraftBucketFunction]] (the catalog-registered V2 function SPJ
  * resolves the transform against). Files carry their bucket in the
  * directory name (`__graft_bucket=<i>`), so the manifest needs no new
  * fields and bucket resolution is pure path arithmetic.
  *
  * Trade-off, stated: a bucketed scan exposes AT MOST one input
  * partition per bucket (that is what makes the join co-located), so
  * `n` is also the read parallelism — pick it like Hive bucket counts.
  * Every DML preserves the layout: DELETE's survivor rewrite goes
  * through the bucket-aware INSERT path, and MERGE/UPDATE's replace
  * write bucket-routes rewritten rows in a single pass straight into
  * per-bucket files (see [[GraftBucketRoutedBatchWrite]]).
  */
object GraftBucketed {

  val BucketDirPrefix = "__graft_bucket="
  private val BucketRe = ".*__graft_bucket=(\\d+)/[^/]*$".r

  def bucketOf(path: String): Option[Int] = path match {
    case BucketRe(b) => Some(b.toInt)
    case _ => None
  }

  /** Spark's Murmur3 long hash (seed 42) mod n — MUST stay equal to
    * `pmod(hash(col), n)` for a BIGINT column, which is what the write
    * path computes with Spark's own expression.
    */
  def bucketId(key: Long, n: Int): Int = {
    val h = Murmur3_x86_32.hashLong(key, 42)
    ((h % n) + n) % n
  }
}

/** The V2 `bucket` function [[GraftCatalog]] serves for SPJ transform
  * resolution. Bound shape: (int numBuckets, bigint key) -> int.
  */
private[graft] class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(murmur3(key), n) — graft lake bucketing"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == LongType,
      s"graft bucket expects (int, bigint), got ${inputType.simpleString}")
    new GraftBucketFunction
  }
}

private[graft] class GraftBucketFunction extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(int,bigint)"
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // NULL keys must hash like Spark's hash(NULL) = seed (42) — the
    // single-pass router files them under __graft_bucket=(42%n), so
    // the write distribution must CLUSTER them into that same bucket's
    // task or a NULL-carrying INSERT lands two files in one bucket dir
    // (review finding, round 11; getLong on a null slot reads 0)
    if (input.isNullAt(1)) ((42 % n) + n) % n
    else GraftBucketed.bucketId(input.getLong(1), n)
  }
}

/** Scan builder for a bucketed table: column pruning and filter
  * pushdown delegate untouched to Spark's own parquet builder; only
  * the built scan is wrapped to regroup input partitions per bucket
  * and report the key-grouped partitioning.
  */
private[graft] class GraftBucketedScanBuilder(
    spark: SparkSession,
    tableName: String,
    dir: String,
    rows: Seq[GraftLakeTable.ManifestRow],
    tableSchema: StructType,
    bucketCol: String,
    nBuckets: Int,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownCatalystFilters {

  private val inner = ParquetTable(tableName, spark, options,
    rows.map(r => GraftLakeTable.resolveFile(dir, r.file)),
    Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner.pushFilters(filters)
  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  override def build(): Scan =
    new GraftBucketedScan(inner.build(), bucketCol, nBuckets, rows)
}

private[graft] class GraftBucketedScan(inner: Scan, bucketCol: String,
                                       nBuckets: Int,
                                       statsRows: Seq[GraftLakeTable.ManifestRow] = Nil)
  extends Scan with SupportsReportPartitioning with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** K49: exact manifest-fed stats (the bucketed path keeps the full
    * snapshot list — no file-level pruning happens before build).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    GraftManifestStats.of(statsRows, readSchema())

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"GraftBucketedScan(bucket($nBuckets, $bucketCol), ${inner.description()})"

  /** One partition per bucket PRESENT in the scan (after pushdown
    * pruning): Spark's SPJ aligns the two sides by these partition-key
    * rows and fills value gaps when
    * `spark.sql.sources.v2.bucketing.pushPartValues.enabled` is on.
    */
  private lazy val grouped: Array[InputPartition] = {
    val files = inner.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"parquet scan yielded ${other.getClass} — expected FilePartition")
    }
    files.groupBy(f => GraftBucketed.bucketOf(f.urlEncodedPath).getOrElse(
      throw new IllegalStateException(
        s"file ${f.urlEncodedPath} has no ${GraftBucketed.BucketDirPrefix} dir " +
          "— bucketed tables only contain bucket-routed files")))
      .toSeq.sortBy(_._1)
      .zipWithIndex
      .map { case ((bucket, fs), idx) =>
        new GraftBucketPartition(FilePartition(idx, fs.toArray),
          new GenericInternalRow(Array[Any](bucket))): InputPartition
      }.toArray
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(GraftLakeTable.bucketTransform(nBuckets, bucketCol)), grouped.length)

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = grouped
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBucketReaderFactory(inner.toBatch.createReaderFactory())
}

/** Scan builder for plain (non-bucketed) catalog tables — K35: the
  * manifest's per-file min/max stats prune the FILE LIST at scan build
  * from the pushed filters, before Spark's parquet machinery ever
  * lists or opens a file (the Iceberg/Delta data-skipping shape: the
  * same metadata MERGE's runtime group filter uses, applied statically
  * to every SELECT). Pruning uses [[GraftGroupScan.mayMatch]], which
  * answers `false` only for provably-empty files — unsupported
  * predicate shapes, stat-less files and incomparable values all keep
  * the file, so a missed prune costs I/O, never rows. Column pruning
  * and filter pushdown then continue untouched in Spark's own parquet
  * builder over the surviving files (row-group skipping stacks on
  * top). At 100 TB: a point or range query touches the intersecting
  * files' bytes, not the table's.
  */
private[graft] class GraftPrunedScanBuilder(
    spark: SparkSession,
    tableName: String,
    dir: String,
    rows: Seq[GraftLakeTable.ManifestRow],
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownCatalystFilters {

  private def allPaths = rows.map(r => GraftLakeTable.resolveFile(dir, r.file))
  // eager inner builder over the FULL list: it owns the
  // pushdown-state bookkeeping Spark queries between calls
  // (pushedFilters for plan display); build() replays onto the
  // pruned list
  private val probe = ParquetTable(tableName, spark, options, allPaths,
    Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)
  private var required: Option[StructType] = None
  private var pushedExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    probe.pruneColumns(requiredSchema)
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    pushedExprs = filters
    probe.pushFilters(filters)
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    probe.pushedFilters

  /** The post-pushdown file list the LAST `build()` kept — what the
    * wrapping scan's K49 statistics report, so a stat-pruned scan's
    * numRows/sizeInBytes reflect the files it will actually read.
    */
  private[graft] var builtSurvivors: Seq[GraftLakeTable.ManifestRow] = rows

  override def build(): Scan = {
    val v1 = pushedExprs.flatMap(e =>
      org.apache.spark.sql.execution.datasources.DataSourceStrategy
        .translateFilter(e, supportNestedPredicatePushdown = true))
    val survivors =
      if (v1.isEmpty) rows
      else rows.filter(r =>
        v1.forall(f => GraftGroupScan.mayMatch(tableSchema, r.stats, f)))
    builtSurvivors = survivors
    if (survivors.length == rows.length) probe.build()
    else {
      val inner = ParquetTable(tableName, spark, options,
        survivors.map(r => GraftLakeTable.resolveFile(dir, r.file)),
        Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)
      required.foreach(inner.pruneColumns)
      inner.pushFilters(pushedExprs)
      inner.build()
    }
  }
}

/** A bucket's files, tagged with the partition-key row SPJ groups by. */
private[graft] class GraftBucketPartition(val delegate: FilePartition,
                                          key: InternalRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

private[graft] class GraftBucketReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition =
    p.asInstanceOf[GraftBucketPartition].delegate
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
