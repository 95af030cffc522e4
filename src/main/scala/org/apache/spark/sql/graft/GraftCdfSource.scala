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
  * K23's full-outer-by-key derivation, one step per version so every
  * change row carries its `_commit_version` (the Delta CDF contract:
  * changes are attributed to the commit that made them, never
  * collapsed across commits). Change rows are Delta-shaped: the full
  * row image plus `_change_type` in `insert | delete |
  * update_preimage | update_postimage`.
  *
  * This closes the gap E38 leaves for incremental consumers: E38
  * follows appended FILES and refuses rewriting versions, so
  * downstream aggregate/join maintenance (T18/T25) only ever saw
  * inserts. The CDF stream subscribes them to UPDATEs and DELETEs
  * too — the maintenance delta is exactly `getBatch`'s output.
  *
  * Contract + scale posture, stated:
  *   - The diff is DERIVED BY KEY (`key` must identify a row within a
  *     version — the same uniqueness contract K13's CDC merge and
  *     Iceberg equality deletes state). Production formats shortcut
  *     by writing CDC files at commit time; deriving keeps history
  *     replayable from data alone, at the cost of one key-partitioned
  *     full-outer join per STEP.
  *   - Versions carrying MERGE-ON-READ delete files are REFUSED with
  *     a named error (the raw-file diff cannot apply delete masks —
  *     an unmasked read would misread delete files as data and miss
  *     the deletions): compact deletes first, or stream from a
  *     copy-on-write table; CDF through the catalog's masked read is
  *     the round-12 rung.
  *   - A version whose manifest fell out of VACUUM retention fails
  *     the stream with E38's named out-of-retention error.
  *   - `startingVersion = v` replays history from commit v (v=1 =
  *     initial snapshot delivered as inserts, Delta's
  *     startingVersion=0 semantics).
  */
class GraftCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  /** `option("table", "cat.ns.t")` — the CATALOG rung (E40): snapshots
    * read THROUGH the catalog's `VERSION AS OF`, i.e. the table's own
    * masked read — so merge-on-read delete vectors apply and MoR
    * tables get a correct change feed (deletions appear as deletes,
    * where the raw manifest mode must refuse). Schema and manifest
    * location resolve from the catalog; only `key` stays required.
    */
  // memoized per provider instance: the engine calls sourceSchema and
  // createSource on the SAME instance at stream start, and the table
  // resolve (catalog round-trip + analysis) need not run twice
  @volatile private var tableMemo: Map[String, (String, String, StructType)] =
    Map.empty

  private def tableConfig(sqlContext: SQLContext,
                          parameters: Map[String, String])
      : Option[(String, String, StructType)] =
    parameters.get("table").map { tbl =>
      tableMemo.getOrElse(tbl, {
        val spark = sqlContext.sparkSession
        val parts = tbl.split('.')
        require(parts.length >= 3,
          s"graft-cdf table option must be a catalog-qualified name (got '$tbl')")
        val root = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
          .getOrElse(throw new IllegalArgumentException(
            s"graft-cdf: '${parts.head}' is not a configured graft catalog"))
        val dir = (parts.tail.foldLeft(new org.apache.hadoop.fs.Path(root))(
          (p, n) => new org.apache.hadoop.fs.Path(p, n))).toString
        val resolved = (tbl, s"$dir/manifest", spark.table(tbl).schema)
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
      parameters.get("dir"), cat.map(_._1))
  }
}

private[graft] object GraftCdfSource {
  /** Change rows = the full row image + Delta's CDF metadata pair. */
  def cdfSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

private[graft] class GraftCdfSource(
    spark: SparkSession,
    manBase: String,
    keyCol: String,
    tableSchema: StructType,
    startingVersion: Option[Long],
    dirOpt: Option[String],
    catalogTable: Option[String] = None)
  extends Source {

  override val schema: StructType = GraftCdfSource.cdfSchema(tableSchema)

  private def committed: Seq[Long] = ManifestStore.versions(spark, manBase)

  private def longOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[LegacyOffset] =
    committed.lastOption.map(LongOffset.apply)

  /** Resolve a version's file list against the manifest (the shared
    * E38/E39 retention contract: a swept version fails NAMED, not as
    * a raw missing-path read). Manifest rows may carry absolute paths
    * (the K9 lake shape) or table-relative ones (the catalog lake) —
    * the `dir` option anchors the latter. A version carrying
    * merge-on-read DELETE files is REFUSED: the diff reads raw data
    * files, so an unmasked read would misread a delete file as
    * all-null data rows and miss the deletion entirely — compact
    * deletes first, or take the catalog table's masked read (the
    * round-12 CDF-through-the-catalog rung).
    */
  private def filesAt(v: Long): Seq[String] = {
    val raw = GraftLakeTable.filesAtRetained(spark, manBase, v,
      s"graft-cdf over $manBase")
    raw.find(f => f.startsWith("deletes_") || f.startsWith("posdel_") ||
        f.contains("/deletes_") || f.contains("/posdel_"))
      .foreach(f => throw new IllegalStateException(
        s"graft-cdf over $manBase: version $v carries merge-on-read delete " +
          s"file(s) ($f) — the key-derived diff reads raw data files and " +
          "cannot apply delete masks; run CALL system.compact_deletes first " +
          "or stream changes from a copy-on-write table"))
    raw.map(f => dirOpt match {
      case Some(d) if !f.startsWith("/") && !f.contains(":/") => s"$d/$f"
      case _ => f
    })
  }

  private def readVersion(v: Long, retained: Seq[Long]): DataFrame = catalogTable match {
    // catalog mode: the snapshot is the table's OWN pinned read —
    // merge-on-read delete vectors/keys apply, so deletions diff as
    // deletes instead of being refused (the raw mode's limitation);
    // retention fails named off the ALREADY-LISTED version set (no
    // extra manifest read per snapshot — review finding, round 11)
    case Some(tbl) =>
      if (v == 0L)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          tableSchema)
      else {
        if (!retained.contains(v))
          throw new IllegalStateException(
            s"graft-cdf over $tbl: version $v is no longer committed " +
              s"(retained: ${retained.headOption.getOrElse(0L)}.." +
              s"${retained.lastOption.getOrElse(0L)}) — it fell out of " +
              "VACUUM retention; restart from a retained startingVersion")
        spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
      }
    case None =>
      val files = filesAt(v)
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          tableSchema)
      else spark.read.schema(tableSchema).parquet(files: _*)
  }

  /** One commit's row-level changes: K23's full-outer-by-key diff of
    * the two adjacent snapshots, Delta-shaped (update = preimage row +
    * postimage row), tagged with the commit version.
    */
  private def stepChanges(prevV: Long, v: Long, retained: Seq[Long]): DataFrame = {
    val valueCols = tableSchema.fieldNames.filterNot(_ == keyCol).toSeq
    val pre = readVersion(prevV, retained)
      .select(col(keyCol), imgStruct(valueCols).as("pre"))
    val post = readVersion(v, retained)
      .select(col(keyCol), imgStruct(valueCols).as("post"))
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
    val steps = committed.filter(v => v > s && v <= e).sorted
    val batch =
      if (steps.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
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
          stepChanges(base, v, all)
        }.reduce(_ unionByName _)
      }
    // the engine grafts this plan in place of the streaming relation
    // and asserts isStreaming — materialize through the internal-row
    // RDD bridge (lazy: the diff runs when the batch executes)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: LegacyOffset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String =
    s"GraftCdfSource[$manBase, key=$keyCol, starting=$startingVersion]"
}
