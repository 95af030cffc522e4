package org.apache.spark.sql.graft

import java.util

import graft.sinks.ManifestStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

/** K41: ATOMIC `CREATE TABLE AS SELECT` / `REPLACE TABLE AS SELECT` —
  * the [[StagingTableCatalog]] half of the catalog: without it Spark
  * falls back to create-then-write-then-drop-on-failure, which leaves
  * (a) a visible EMPTY table between the create and the write and
  * (b) an orphaned table if the driver dies mid-CTAS. Staged, the
  * whole table builds INVISIBLY and becomes real in one commit:
  *
  *   - CTAS stages meta + data + manifest under a dot-prefixed dir in
  *     the namespace and commits by ONE directory rename onto the
  *     table path — complete-by-construction (the ManifestStore claim
  *     pattern, sentinel-checked against LocalFileSystem's
  *     copy-into-existing-dest rename fallback). A concurrent CREATE
  *     that claimed the name first fails THIS commit with
  *     TableAlreadyExists and the staging dir is removed — no residue.
  *   - RTAS stages the same way, then commits by moving the staged
  *     data dirs into the EXISTING table dir (invisible until listed),
  *     publishing ONE overwrite manifest version (stats carried from
  *     the staged commit — no recompute), and swapping the meta file
  *     (FileContext OVERWRITE rename). File list and schema each flip
  *     atomically; for a schema-changing REPLACE the manifest flips
  *     first, so a racing reader sees new files under the old schema
  *     for one resolution — by-name parquet resolution (K19's
  *     contract) makes that window null-fill, never corrupt. The old
  *     snapshot's versions stay committed (time travel across a
  *     REPLACE works).
  *
  * Failure atomicity (abortStagedChanges) deletes the staging dir —
  * a failed CTAS leaves no table, a failed RTAS leaves the old table
  * byte-identical. Spec-pinned in Round23Spec.
  */
private[graft] class GraftStagedTable(
    spark: SparkSession,
    fs: FileSystem,
    ident: Identifier,
    fullName: String,
    stagingDir: Path,
    finalDir: Path,
    schema0: StructType,
    bucketSpec: Option[(String, Int)],
    morKey: Option[String],
    metaText: String,
    replaceExisting: Boolean)
  extends StagedTable with SupportsWrite {

  // the staged meta is written at stage time: the staging dir is a
  // complete table the moment the commit rename lands
  {
    fs.mkdirs(stagingDir)
    val out = fs.create(new Path(stagingDir, "_graft_table.json"), true)
    try out.write(metaText.getBytes("UTF-8")) finally out.close()
  }

  override def name(): String = fullName
  override def schema(): StructType = schema0
  // write-only: advertising BATCH_READ without SupportsRead would
  // pass capability checks and fail on the cast
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // staged dir starts empty
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              GraftLakeTable.insert(data.sparkSession, stagingDir.toString,
                data, overwrite = false, bucketSpec = bucketSpec)
          }
      }
    }

  override def commitStagedChanges(): Unit =
    if (replaceExisting && fs.exists(new Path(finalDir, "_graft_table.json")))
      commitReplace()
    else commitCreate()

  /** One atomic rename claims the identifier AND delivers the content.
    * LocalFileSystem's rename-with-existing-dest fallback copies the
    * source INTO the destination and returns true — detected by the
    * nested-dir check, cleaned, and surfaced as the CREATE uniqueness
    * failure (the ManifestStore claim discipline).
    */
  private def commitCreate(): Unit = {
    val renamed = fs.rename(stagingDir, finalDir)
    val nested = new Path(finalDir, stagingDir.getName)
    if (renamed && fs.exists(new Path(finalDir, "_graft_table.json")) &&
        !fs.exists(nested)) {
      ()
    } else if (!renamed && !fs.exists(finalDir)) {
      // destination free but the rename still failed: a GENUINE IO
      // error, not a lost race — surface it (the staged table is left
      // for abortStagedChanges; claiming "already exists" here would
      // destroy the completed CTAS output and mask the real fault —
      // ManifestStore.commitAttempt's exact discipline)
      throw new java.io.IOException(
        s"staged commit rename $stagingDir -> $finalDir failed with no " +
          "competing table at the destination")
    } else {
      if (fs.exists(nested)) fs.delete(nested, true)
      if (fs.exists(stagingDir)) fs.delete(stagingDir, true)
      throw new TableAlreadyExistsException(ident)
    }
  }

  private def commitReplace(): Unit = {
    val stagedMan = s"$stagingDir/manifest"
    val stagedRows = ManifestStore.versions(spark, stagedMan).lastOption
      .map(v => GraftLakeTable.manifestRowsFull(spark, stagedMan, v))
      .getOrElse(Seq.empty)
    // move the staged data dirs into the live table dir — relative
    // manifest paths survive the move verbatim; invisible until the
    // manifest publish lists them
    val dataDirNames = stagedRows.map(_.file.split('/').head).distinct
    dataDirNames.foreach { d =>
      if (!fs.rename(new Path(stagingDir, d), new Path(finalDir, d)))
        throw new java.io.IOException(
          s"RTAS commit: failed to move staged data dir $d into $finalDir")
    }
    // ONE overwrite manifest version — old versions stay committed
    val manBase = s"$finalDir/manifest"
    var committed = false
    var attempt = 0
    while (!committed && attempt < 50) {
      attempt += 1
      val basedOn = ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
      val manifest = GraftLakeTable.publishRows(spark,
        stagedRows.map(_.copy(seq = basedOn + 1)))
      committed = ManifestStore.tryPublish(spark, manBase, manifest, basedOn + 1)
    }
    if (!committed)
      throw new java.io.IOException(s"RTAS commit under $finalDir lost the race $attempt times")
    // schema swap last (see class doc for the by-name-resolution window)
    val tmp = new Path(finalDir, s".meta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(metaText.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(finalDir.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, new Path(finalDir, "_graft_table.json"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.delete(stagingDir, true)
  }

  override def abortStagedChanges(): Unit =
    if (fs.exists(stagingDir)) fs.delete(stagingDir, true)
}
