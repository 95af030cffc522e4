package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** E39: the STREAMING CHANGE DATA FEED — Delta's `readChangeFeed`
  * stream over the versioned manifest lake, the rung between E38 (the
  * lake as an APPEND stream source) and K23 (BATCH row-level changes
  * between two pinned versions):
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .schema(tableSchema)            // key + value columns
  *     .option("manifest", "<table>/manifest")
  *     .option("key", "o_orderkey")
  *     .load()
  * }}}
  *
  * Offsets are committed manifest VERSIONS (E38's offset space, so
  * progress rides Spark's own checkpointing: resume mid-history,
  * exactly-once per version). Each micro-batch is the union of
  * PER-COMMIT row-level diffs across the admitted version range —
  * one step per version so every change row carries its
  * `_commit_version` (the Delta CDF contract: changes are attributed
  * to the commit that made them, never collapsed across commits).
  * Change rows are Delta-shaped: the full row image plus
  * `_change_type` in `insert | delete | update_preimage |
  * update_postimage`.
  *
  * COST CLASS — O(change), not O(table) (round-12 rework): a commit's
  * changes are derived from its MANIFEST DELTA, never from rereading
  * the snapshots. Per step `(v-1, v)`:
  *
  *   - pre-side  = live rows of data files the commit REMOVED, plus
  *     rows newly masked by the commit's ADDED position/equality
  *     delete files (read from exactly the files those deletes name,
  *     position/key-filtered);
  *   - post-side = rows of data files the commit ADDED (a file added
  *     at v can carry no v-mask: position deletes name only
  *     already-committed files and equality deletes apply strictly
  *     below their own seq);
  *   - the K23 full-outer-by-key diff runs over those two row sets
  *     alone. Rows in carried (path-identical) files with unchanged
  *     masks are by construction identical in both snapshots and can
  *     never produce a change row, so restricting the diff to the
  *     touched files preserves the output bit-for-bit — while a 1-row
  *     DML's micro-batch now reads O(1) files on a million-file table
  *     (spec-pinned by counting input files off the executed plan).
  *     A pure append short-circuits to `insert`-tagged reads of the
  *     added files with no join at all; a version that only rewrites
  *     rows it does not change (compaction, Z-ORDER) costs the
  *     rewritten files and emits nothing.
  *
  * Admission control (round-12): `maxVersionsPerTrigger` (default 128)
  * bounds how many versions one micro-batch may union — a
  * `startingVersion = 1` replay of an N-commit history drains in
  * ⌈N/cap⌉ batches instead of building one N-join plan. Under
  * `Trigger.AvailableNow` the V1-source wrapper latches one offset per
  * RUN, so a capped replay drains cap versions per run — re-trigger
  * (or raise the cap) to continue; a continuous stream catches up
  * across triggers.
  *
  * Contract, stated:
  *   - The diff is DERIVED BY KEY (`key` must identify a row within a
  *     version — the same uniqueness contract K13's CDC merge and
  *     Iceberg equality deletes state).
  *   - Raw-manifest mode refuses versions carrying MERGE-ON-READ
  *     delete files with a named error (a raw-file read cannot apply
  *     delete masks); the CATALOG mode (`option("table", ...)`, E40)
  *     applies position/equality masks file-level and diffs MoR DML
  *     correctly.
  *   - A version whose manifest fell out of VACUUM retention fails
  *     the stream with E38's named out-of-retention error.
  *   - `startingVersion = v` replays history from commit v; the base
  *     snapshot (v=1, or a startingVersion pinned on the oldest
  *     retained version) is delivered as `insert` rows via the
  *     table's own (masked) snapshot read — inherently O(snapshot),
  *     exactly once per stream.
  */
class GraftCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  /** `option("table", "cat.ns.t")` — the CATALOG rung (E40): delete
    * masks resolve from the table's own manifest (position/equality
    * files), so merge-on-read tables get a correct change feed
    * (deletions appear as deletes, where the raw manifest mode must
    * refuse). Schema, manifest location and table dir resolve from
    * the catalog; only `key` stays required.
    */
  // memoized per provider instance: the engine calls sourceSchema and
  // createSource on the SAME instance at stream start, and the table
  // resolve (catalog round-trip + analysis) need not run twice. The
  // memo PINS the stream-start schema: a concurrent ALTER between
  // sourceSchema and createSource does not move the stream's schema
  // mid-start (the stream reads what it declared).
  @volatile private var tableMemo: Map[String, (String, String, StructType, String)] =
    Map.empty

  private def tableConfig(sqlContext: SQLContext,
                          parameters: Map[String, String])
      : Option[(String, String, StructType, String)] =
    parameters.get("table").map { tbl =>
      tableMemo.getOrElse(tbl, {
        val spark = sqlContext.sparkSession
        val parts = tbl.split('.')
        require(parts.length >= 3,
          s"graft-cdf table option must be a catalog-qualified name (got '$tbl')")
        val root = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
          .getOrElse(throw new IllegalArgumentException(
            s"graft-cdf: '${parts.head}' is not a configured graft catalog"))
        // the table dir resolves through the catalog's OWN layout
        // helper — the one place the <root>/<ns...>/<table> convention
        // lives (see GraftCatalog.layoutDir)
        val dir = GraftCatalog.layoutDir(root, parts.tail.toSeq).toString
        val resolved = (tbl, s"$dir/manifest", spark.table(tbl).schema, dir)
        tableMemo += tbl -> resolved
        resolved
      })
    }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val table = tableConfig(sqlContext, parameters).map(_._3)
      .orElse(schema)
      .getOrElse(throw new IllegalArgumentException(
        "graft-cdf requires the table schema (.schema(...)) or option 'table'"))
    (shortName(), GraftCdfSource.cdfSchema(table))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val cat = tableConfig(sqlContext, parameters)
    val table = cat.map(_._3).orElse(schema).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdf requires the table schema (.schema(...)) or option 'table'"))
    val manifest = cat.map(_._2).orElse(parameters.get("manifest")).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdf requires option 'manifest' (or 'table')"))
    val key = parameters.getOrElse("key",
      throw new IllegalArgumentException("graft-cdf requires option 'key'"))
    require(table.fieldNames.contains(key),
      s"key column '$key' is not in the schema ${table.simpleString}")
    new GraftCdfSource(sqlContext.sparkSession, manifest, key, table,
      parameters.get("startingVersion").map(_.toLong),
      cat.map(_._4).orElse(parameters.get("dir")), cat.map(_._1),
      parameters.get("maxVersionsPerTrigger").map(_.toInt).getOrElse(128))
  }
}

private[graft] object GraftCdfSource {
  /** Change rows = the full row image + Delta's CDF metadata pair. */
  def cdfSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

class GraftCdfSource(
    spark: SparkSession,
    manBase: String,
    keyCol: String,
    tableSchema: StructType,
    startingVersion: Option[Long],
    dirOpt: Option[String],
    catalogTable: Option[String] = None,
    maxVersionsPerTrigger: Int = 128)
  extends Source {

  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1 (got $maxVersionsPerTrigger)")

  // an EQUALITY-merge-on-read table's delete files hold the table's
  // OWN MoR key column — deriving the feed with any other key would
  // read the delete files against an absent column, null-fill every
  // key, and silently drop all delete masks (review finding, round
  // 12). Positional tables are key-agnostic (masks address (file,pos)),
  // so only the equality mode pins the stream key.
  for (d <- dirOpt if catalogTable.isDefined) {
    val metaPath = new org.apache.hadoop.fs.Path(d, "_graft_table.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(metaPath)) {
      GraftTableMeta.readFull(fs, metaPath).morKey.foreach { mk =>
        require(mk == keyCol,
          s"graft-cdf over ${catalogTable.get}: the table's merge-on-read " +
            s"key is '$mk' — the change feed must be derived with that key " +
            s"(got option key '$keyCol'); any other key cannot interpret " +
            "the table's equality-delete files")
      }
    }
  }

  override val schema: StructType = GraftCdfSource.cdfSchema(tableSchema)

  private def committed: Seq[Long] = ManifestStore.versions(spark, manBase)

  private def longOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  /** The highest version a batch has covered — what the per-trigger
    * version cap advances from. Restored on resume through the
    * engine's own restart `getBatch` call (MicroBatchExecution
    * re-invokes V1 sources with the checkpointed range exactly so
    * they can restore internal tracking).
    */
  @volatile private var progressedTo: Long = -1L

  /** Cap the admitted end version at `maxVersionsPerTrigger` past the
    * covered progress — the per-trigger admission control (ADVICE
    * finding, round 11): a long startingVersion replay drains in
    * bounded batches instead of unioning one unbounded plan.
    */
  override def getOffset: Option[LegacyOffset] = {
    val all = committed
    if (all.isEmpty) return None
    val base = math.max(progressedTo,
      startingVersion.map(_ - 1L).getOrElse(0L))
    val pending = all.filter(_ > base)
    // idle: report BASE itself, never clamped to the last committed
    // version — clamping below the startingVersion floor would record
    // an offset under the floor and a later getBatch(start=floor-k)
    // would deliver commits the user explicitly excluded (review
    // finding, round 12). An offset beyond the committed head is fine:
    // the range it opens is empty until those versions exist.
    if (pending.isEmpty) Some(LongOffset(base))
    else Some(LongOffset(pending.take(maxVersionsPerTrigger).last))
  }

  // ---- manifest-delta classification -------------------------------------

  private def who: String = s"graft-cdf over ${catalogTable.getOrElse(manBase)}"

  /** Committed manifests are immutable → bounded per-source LRU (the
    * E38 stream source's cache shape): consecutive steps share their
    * boundary version, so without the memo a 128-version batch read
    * ~255 manifests where ~129 suffice (review finding, round 12).
    */
  private val manifestCache =
    new java.util.LinkedHashMap[Long, Seq[GraftLakeTable.ManifestRow]](16, 0.75f, true) {
      // 8, not the version cap: each version is re-used at most by its
      // immediate successor step, so a small window keeps the full
      // sharing win while bounding driver heap to O(8 × table-files)
      // rather than O(cap × table-files) (review pass 2, round 12)
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Seq[GraftLakeTable.ManifestRow]]): Boolean =
        size() > 8
    }

  private def rowsAt(v: Long): Seq[GraftLakeTable.ManifestRow] =
    manifestCache.synchronized {
      val hit = manifestCache.get(v)
      if (hit != null) hit
      else {
        val rows = GraftLakeTable.rowsAtRetained(spark, manBase, v, who)
        manifestCache.put(v, rows)
        rows
      }
    }

  private def isPosDel(f: String): Boolean =
    f.startsWith("posdel_") || f.contains("/posdel_")
  private def isEqDel(f: String): Boolean =
    f.startsWith("deletes_") || f.contains("/deletes_")
  private def isDel(f: String): Boolean = isPosDel(f) || isEqDel(f)

  /** Raw-manifest mode cannot apply delete masks — refuse NAMED (the
    * round-11 review finding: an unmasked read would misread delete
    * files as data and miss the deletions).
    */
  private def refuseRawDeletes(v: Long, rows: Seq[GraftLakeTable.ManifestRow]): Unit =
    if (catalogTable.isEmpty)
      rows.find(r => isDel(r.file)).foreach(r => throw new IllegalStateException(
        s"graft-cdf over $manBase: version $v carries merge-on-read delete " +
          s"file(s) (${r.file}) — the key-derived diff reads raw data files and " +
          "cannot apply delete masks; run CALL system.compact_deletes first " +
          "or stream changes from a copy-on-write table"))

  private def absOf(f: String): String = dirOpt match {
    case Some(d) if !f.startsWith("/") && !f.contains(":/") =>
      GraftLakeTable.resolveFile(d, f)
    case _ => f
  }

  private val posDelSchema = StructType(Seq(
    StructField("file", StringType), StructField("pos", LongType)))

  private def emptyDf(s: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)

  private def readData(rows: Seq[GraftLakeTable.ManifestRow]): DataFrame =
    if (rows.isEmpty) emptyDf(tableSchema)
    else spark.read.schema(tableSchema).parquet(rows.map(r => absOf(r.file)): _*)

  /** Read data files WITH row lineage: the table columns plus the
    * manifest-relative path (`__rel`), the in-file row ordinal
    * (`__pos`, the parquet reader's native `_metadata.row_index`) and
    * the file's commit seq (`__fseq`) — what position/equality masks
    * join against. The rel resolution is an equi-join on the file's
    * BASENAME (part-file names carry a write-unique UUID) against the
    * broadcast manifest-row list, with the full `/<rel>` suffix kept
    * as a correctness filter.
    */
  private def readWithLineage(rows: Seq[GraftLakeTable.ManifestRow]): DataFrame = {
    import spark.implicits._
    val rel = rows.map(r =>
        (r.file, r.file.substring(r.file.lastIndexOf('/') + 1), r.seq))
      .toDF("__rel", "__base", "__fseq")
    spark.read.schema(tableSchema).parquet(rows.map(r => absOf(r.file)): _*)
      .withColumn("__abs", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .withColumn("__base", element_at(split(col("__abs"), "/"), -1))
      .join(broadcast(rel), "__base")
      .where(col("__abs").endsWith(concat(lit("/"), col("__rel"))))
  }

  /** Drop rows masked at the PRE version: anti-join the position
    * pairs and the seq-applicable equality keys (an equality delete
    * masks only files with a strictly smaller seq — the Iceberg
    * data-sequence rule the read path also follows).
    */
  private def applyMasks(lineage: DataFrame,
                         posPairs: Option[DataFrame],
                         eqKeys: Option[DataFrame]): DataFrame = {
    var df = lineage
    posPairs.foreach { p =>
      df = df.join(p,
        df("__rel") === p("file") && df("__pos") === p("pos"), "left_anti")
    }
    eqKeys.foreach { k =>
      df = df.join(k,
        df(s"`$keyCol`") === k("__dkey") && k("__dseq") > df("__fseq"),
        "left_anti")
    }
    df
  }

  private def dataCols: Seq[org.apache.spark.sql.Column] =
    tableSchema.fieldNames.toSeq.map(c => col(s"`$c`"))

  /** The whole snapshot at `v` delivered as `insert` rows — the
    * startingVersion base case (and v=1). Catalog mode reads through
    * the table's own masked `VERSION AS OF`; inherently O(snapshot),
    * exactly once per stream.
    */
  private def snapshotAsInserts(v: Long): DataFrame = {
    val body = catalogTable match {
      case Some(tbl) => spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
      case None =>
        val rows = rowsAt(v)
        refuseRawDeletes(v, rows)
        readData(rows)
    }
    tagged(body, "insert", v)
  }

  private def tagged(df: DataFrame, changeType: String, v: Long): DataFrame =
    df.select(dataCols ++ Seq(
      lit(changeType).as("_change_type"), lit(v).as("_commit_version")): _*)

  /** One commit's row-level changes, derived from its MANIFEST DELTA
    * (see the class scaladoc for the cost argument): K23's
    * full-outer-by-key diff of the commit's pre-side (removed files'
    * live rows + newly-masked rows) against its post-side (added
    * files' rows), Delta-shaped and tagged with the commit version.
    * Pure appends short-circuit to inserts; pure removals to deletes.
    */
  private def stepChanges(prevV: Long, v: Long): DataFrame = {
    if (prevV == 0L) return snapshotAsInserts(v)
    val prevRows = rowsAt(prevV)
    val curRows = rowsAt(v)
    refuseRawDeletes(prevV, prevRows)
    refuseRawDeletes(v, curRows)

    val prevData = prevRows.filterNot(r => isDel(r.file))
    val curData = curRows.filterNot(r => isDel(r.file))
    val prevFiles = prevData.map(_.file).toSet
    val curFiles = curData.map(_.file).toSet
    val removedData = prevData.filterNot(r => curFiles.contains(r.file))
    val addedData = curData.filterNot(r => prevFiles.contains(r.file))
    val carriedData = curData.filter(r => prevFiles.contains(r.file))

    val prevPos = prevRows.filter(r => isPosDel(r.file))
    val curPos = curRows.filter(r => isPosDel(r.file))
    val prevEq = prevRows.filter(r => isEqDel(r.file))
    val curEq = curRows.filter(r => isEqDel(r.file))
    val prevPosFiles = prevPos.map(_.file).toSet
    val prevEqFiles = prevEq.map(_.file).toSet
    val addedPos = curPos.filterNot(r => prevPosFiles.contains(r.file))
    val addedEq = curEq.filterNot(r => prevEqFiles.contains(r.file))

    // pure append: every added row is an insert, no join, no pre-read
    if (removedData.isEmpty && addedPos.isEmpty && addedEq.isEmpty)
      return tagged(readData(addedData), "insert", v)

    // masks in force at the PRE version (empty for copy-on-write
    // tables — the common case reads removed files with no lineage)
    val prevPosPairs: Option[DataFrame] =
      if (prevPos.isEmpty) None
      else Some(spark.read.schema(posDelSchema)
        .parquet(prevPos.map(r => absOf(r.file)): _*))
    val prevEqKeys: Option[DataFrame] =
      if (prevEq.isEmpty) None
      else Some(prevEq.groupBy(_.seq).toSeq.map { case (s, rs) =>
        spark.read.schema(StructType(Seq(StructField(keyCol, LongType))))
          .parquet(rs.map(r => absOf(r.file)): _*)
          .where(col(s"`$keyCol`").isNotNull)
          .select(col(s"`$keyCol`").as("__dkey"), lit(s).as("__dseq"))
      }.reduce(_ unionByName _))

    // pre 1/3: live rows of the files the commit removed
    val preRemoved: Option[DataFrame] =
      if (removedData.isEmpty) None
      else if (prevPosPairs.isEmpty && prevEqKeys.isEmpty)
        Some(readData(removedData))
      else Some(applyMasks(readWithLineage(removedData),
        prevPosPairs, prevEqKeys).select(dataCols: _*))

    // pre 2/3: rows newly masked by the commit's position-delete
    // files — read exactly the files they name, position-filtered.
    // The pairs name only rows LIVE at prevV (the DML scan reads
    // masked rows as absent and commits serialize strictly against
    // the pinned snapshot), so no re-masking is needed.
    val preNewPos: Option[DataFrame] =
      if (addedPos.isEmpty) None
      else {
        val pairs = spark.read.schema(posDelSchema)
          .parquet(addedPos.map(r => absOf(r.file)): _*)
        val targetRels = pairs.select("file").distinct()
          .collect().map(_.getString(0)).toSet
        val targets = prevData.filter(r => targetRels.contains(r.file))
        Some(readWithLineage(targets)
          .join(pairs,
            col("__rel") === pairs("file") && col("__pos") === pairs("pos"),
            "left_semi")
          .select(dataCols: _*))
      }

    // pre 3/3: rows newly masked by the commit's equality-delete
    // files — carried data files, key-stat-pruned when the key list
    // is small enough to collect, old masks applied BEFORE the new-key
    // semi-join (an already-masked key must not re-diff as a delete)
    val preNewEq: Option[DataFrame] =
      if (addedEq.isEmpty) None
      else {
        val newKeys = spark.read
          .schema(StructType(Seq(StructField(keyCol, LongType))))
          .parquet(addedEq.map(r => absOf(r.file)): _*)
          .where(col(s"`$keyCol`").isNotNull).distinct()
        val keyVals: Option[Array[Long]] = {
          val head = newKeys.limit(10001).collect()
          if (head.length > 10000) None else Some(head.map(_.getLong(0)))
        }
        val candidates = carriedData.filter { r =>
          keyVals match {
            case Some(ks) => r.stats.get(keyCol) match {
              case Some(Seq(mn, mx)) =>
                ks.exists(k => GraftGroupScan.mayContain(LongType, mn, mx, k))
              case _ => true
            }
            case None => true
          }
        }
        if (candidates.isEmpty) None
        else Some(applyMasks(readWithLineage(candidates),
            prevPosPairs, prevEqKeys)
          .join(newKeys.withColumnRenamed(keyCol, "__nk"),
            col(s"`$keyCol`") === col("__nk"), "left_semi")
          .select(dataCols: _*))
      }

    val pre = Seq(preRemoved, preNewPos, preNewEq).flatten
      .reduceOption(_ unionByName _)
    val post = readData(addedData)

    pre match {
      case None => tagged(post, "insert", v)
      case Some(p) if addedData.isEmpty => tagged(p, "delete", v)
      case Some(p) => diffByKey(p, post, v)
    }
  }

  /** K23's full-outer-by-key diff, Delta-shaped (update = preimage row
    * + postimage row), tagged with the commit version.
    */
  private def diffByKey(pre0: DataFrame, post0: DataFrame, v: Long): DataFrame = {
    val valueCols = tableSchema.fieldNames.filterNot(_ == keyCol).toSeq
    val pre = pre0.select(col(s"`$keyCol`"), imgStruct(valueCols).as("pre"))
    val post = post0.select(col(s"`$keyCol`"), imgStruct(valueCols).as("post"))
    pre.join(post, Seq(keyCol), "full_outer")
      .withColumn("changes",
        when(col("post").isNull,
          array(struct(col("pre").as("img"), lit("delete").as("t"))))
        .when(col("pre").isNull,
          array(struct(col("post").as("img"), lit("insert").as("t"))))
        .when(!(col("pre") <=> col("post")),
          array(struct(col("pre").as("img"), lit("update_preimage").as("t")),
            struct(col("post").as("img"), lit("update_postimage").as("t"))))
        .otherwise(array()))
      .select(col(keyCol), explode(col("changes")).as("c"))
      // emit in TABLE-SCHEMA order: the streaming bridge binds these
      // internal rows POSITIONALLY against cdfSchema(tableSchema), so
      // a key column that is not the table's first column must land
      // at its declared ordinal, not at position 0 (review finding,
      // round 11 — long bits read as double otherwise)
      .select(
        tableSchema.fieldNames.toSeq.map(c =>
          if (c == keyCol) col(s"`$keyCol`")
          else col(s"c.img.`$c`").as(c)) ++
          Seq(col("c.t").as("_change_type"),
            lit(v).as("_commit_version")): _*)
  }

  private def imgStruct(valueCols: Seq[String]) =
    struct(valueCols.map(c => col(s"`$c`").as(c)): _*)

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    val s = start.map(longOf).getOrElse(
      startingVersion.map(_ - 1L).getOrElse(0L))
    val e = longOf(end)
    progressedTo = math.max(progressedTo, math.max(s, e))
    val steps = committed.filter(v => v > s && v <= e).sorted
    val batch =
      if (steps.isEmpty) emptyDf(schema)
      else {
        // each commit diffs against its PREDECESSOR version v−1
        // (versions are dense: every publish commits basedOn+1). A
        // predecessor VACUUM swept never silently re-baselines the
        // diff (that would re-deliver the whole table as inserts):
        // it is allowed ONLY when the user explicitly started AT v —
        // startingVersion on the oldest retained version delivers its
        // snapshot as inserts (the satisfiable remedy the retention
        // error names) — and fails NAMED otherwise
        val all = committed
        steps.map { v =>
          val base =
            if (v == 1L || all.contains(v - 1L)) v - 1L
            else if (startingVersion.contains(v)) 0L
            else throw new IllegalStateException(
              s"graft-cdf over $manBase: version ${v - 1} (the diff base of " +
                s"v$v) is no longer committed — it fell out of VACUUM " +
                s"retention; restart with startingVersion >= ${all.headOption
                  .map(_ + 1).getOrElse(1L)}, or startingVersion = " +
                s"${all.headOption.getOrElse(1L)} to re-deliver that " +
                "version's snapshot as inserts")
          stepChanges(base, v)
        }.reduce(_ unionByName _)
      }
    // the engine grafts this plan in place of the streaming relation
    // and asserts isStreaming — materialize through the internal-row
    // RDD bridge (lazy: the diff runs when the batch executes)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The per-step change plan for a committed version — the testable
    * core `getBatch` unions: specs count input files off this plan's
    * execution to pin the O(change) cost class.
    */
  def changesOf(v: Long): DataFrame = {
    val all = committed
    val base = if (v == 1L || all.contains(v - 1L)) v - 1L else 0L
    stepChanges(base, v)
  }

  override def commit(end: LegacyOffset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String =
    s"GraftCdfSource[$manBase, key=$keyCol, starting=$startingVersion, " +
      s"maxVersionsPerTrigger=$maxVersionsPerTrigger]"
}
