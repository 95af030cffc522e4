package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance procedures on the SQL `CALL` surface (K37) —
  * Spark 4's `ProcedureCatalog` rung, the Iceberg `CALL
  * catalog.system.*` shape:
  *
  * {{{
  *   CALL graft.system.optimize('lake.t', 100000)   -- bin-pack files
  *   CALL graft.system.vacuum('lake.t', 2)          -- retention GC
  * }}}
  *
  * `optimize` is K21's small-file compaction on the catalog plane:
  * files whose row count is under the target are read once, rewritten
  * bin-packed (bucket-aware on bucketed tables), and committed as ONE
  * manifest version through the shared replace-commit — files already
  * at size CARRY BY REFERENCE, and the conflict/carry semantics are
  * exactly MERGE's. `vacuum` is K18's retention sweep: manifest
  * versions below latest−keep are dropped, then every data file no
  * RETAINED version references is deleted — referenced-set arithmetic
  * on manifest rows, a metadata job at any table size. Both return
  * one metrics row through a [[LocalScan]], so `CALL` results land in
  * ordinary query output.
  */
private[graft] object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  def load(catalogName: String, root: String,
           ident: org.apache.spark.sql.connector.catalog.Identifier): UnboundProcedure = {
    val ns = ident.namespace().toSeq
    if (ns != Seq("system"))
      throw new RuntimeException(s"catalog procedure not found: ${ident.namespace().mkString(".")}.${ident.name()} (available: system.optimize, system.vacuum)")
    ident.name().toLowerCase match {
      case "optimize" => new OptimizeProcedure(catalogName, root)
      case "vacuum" => new VacuumProcedure(catalogName, root)
      case "compact_deletes" => new CompactDeletesProcedure(catalogName, root)
      case "set_bucketing" => new SetBucketingProcedure(catalogName, root)
      case "begin_txn" => new BeginTxnProcedure(catalogName, root)
      case "commit_txn" => new CommitTxnProcedure(catalogName, root)
      case "abort_txn" => new AbortTxnProcedure(catalogName, root)
      case "set_ref" => new SetRefProcedure(catalogName, root)
      case "drop_ref" => new DropRefProcedure(catalogName, root)
      case _ =>
        throw new RuntimeException(s"catalog procedure not found: ${ident.namespace().mkString(".")}.${ident.name()} (available: system.optimize, system.vacuum, system.compact_deletes, system.set_bucketing, system.begin_txn, system.commit_txn, system.abort_txn, system.set_ref, system.drop_ref)")
    }
  }

  def list(ns: Array[String]): Array[org.apache.spark.sql.connector.catalog.Identifier] =
    Array(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "optimize"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "vacuum"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "compact_deletes"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "set_bucketing"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "begin_txn"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "commit_txn"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "abort_txn"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "set_ref"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "drop_ref"))

  /** Resolve `'ns.table'` under the catalog root + load its meta. */
  private def resolve(catalogName: String, root: String, table: String)
      : (String, StructType, Option[(String, Int)]) = {
    val (dir, m) = resolveFull(catalogName, root, table)
    (dir, m.schema, m.bucket)
  }

  /** The table DIRECTORY for a path-safe `'ns.table'` argument — pure
    * path arithmetic, no meta read (what lock-key derivation needs).
    */
  private def tableDirOf(root: String, table: String): Path = {
    val parts = table.split('.').toSeq
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*")),
      s"procedure table argument '$table' is not a path-safe ns.table name")
    parts.foldLeft(new Path(root))((p, n) => new Path(p, n))
  }

  /** [[resolve]] with the FULL meta (mode flags + the K50 bucket-spec
    * history) — what the evolution procedure and spec-aware commits
    * read.
    */
  private def resolveFull(catalogName: String, root: String, table: String)
      : (String, GraftTableMeta.TableMeta) = {
    val dir = tableDirOf(root, table)
    val meta = new Path(dir, "_graft_table.json")
    val fs = fileSystem(root)
    require(fs.exists(meta), s"catalog '$catalogName' has no table '$table'")
    (dir.toString, GraftTableMeta.readFull(fs, meta))
  }

  private def fileSystem(root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def resultScan(schema: StructType, row: Seq[Any]): java.util.Iterator[Scan] =
    resultScanRows(schema, Seq(row))

  private def resultScanRows(schema: StructType,
                             outRows: Seq[Seq[Any]]): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        outRows.map { row =>
          new GenericInternalRow(row.map {
            case s: String => UTF8String.fromString(s)
            case other => other
          }.toArray): InternalRow
        }.toArray
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  /** `CALL graft.system.optimize(table, target_rows)` — rewrite files
    * under `target_rows` bin-packed; larger files carry by reference.
    */
  /** K39's maintenance half: fold a merge-on-read table's accumulated
    * equality-delete files into a clean snapshot — one MASKED read of
    * the table (deletes applied), one fresh data dir, ONE overwrite
    * manifest version listing no delete files. The pre-compaction
    * versions stay committed (time travel), VACUUM reclaims the old
    * bytes at retention, and OPTIMIZE (which refuses on live delete
    * files — the resurrection hazard) becomes runnable again. This is
    * Iceberg's `rewrite_data_files` for the equality-delete backlog,
    * on the CALL surface.
    */
  private class CompactDeletesProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact_deletes"
    override def description(): String =
      "fold a merge-on-read table's delete files into a clean snapshot"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val (dir, schema, _) = resolve(catalogName, root, table)
      val manBase = s"$dir/manifest"
      val session = spark
      // PIN the snapshot the masked read is built from: a MoR DML
      // committing between this pin and the overwrite publish would be
      // silently DISCARDED by an unconditional overwrite (its delete
      // files dropped, its rows lost — a lost update, while the MoR
      // write path itself strictly serializes). The publish below
      // commits at exactly pinned+1 or aborts with a retry error —
      // the same write-serializable contract as the DML commits.
      val pinned = ManifestStore.versions(session, manBase).lastOption.getOrElse(0L)
      val current =
        if (pinned == 0L) Seq.empty
        else GraftLakeTable.manifestRowsFull(session, manBase, pinned)
      val delRows = current.filter(r => GraftDeltaOperation.isDeleteFile(r.file))
      if (delRows.isEmpty)
        return resultScan(outSchema, Seq(0L, 0L))
      // the MASKED read resolves through the catalog (the MoR scan
      // applies the deletes); the clean rewrite lands in a fresh data
      // dir and ONE overwrite version publishes it — conditionally
      val masked = session.table(s"$catalogName.$table")
      val writerId = java.util.UUID.randomUUID().toString.take(12)
      val dataDir = s"$dir/data_$writerId"
      GraftLakeTable.writeData(dataDir, masked, None)
      val newRows = GraftLakeTable.fileStats(session, dataDir, schema)
      val basedOn = ManifestStore.versions(session, manBase).lastOption.getOrElse(0L)
      if (basedOn != pinned)
        throw new java.io.IOException(
          s"compact_deletes on $table: concurrent commit moved the table " +
            s"to v$basedOn past the pinned v$pinned — retry the compaction")
      val manifest = GraftLakeTable.publishRows(session,
        newRows.map { case (f, n, st, b) =>
          GraftLakeTable.ManifestRow(f, n, "", st, basedOn + 1, b) })
      if (!ManifestStore.tryPublish(session, manBase, manifest, basedOn + 1))
        throw new java.io.IOException(
          s"compact_deletes on $table: lost the commit race at " +
            s"v${basedOn + 1} — retry the compaction")
      val after = GraftLakeTable.manifestRowsFull(session, manBase, basedOn + 1)
      require(!after.exists(r => GraftDeltaOperation.isDeleteFile(r.file)),
        "compaction must leave no delete files")
      resultScan(outSchema,
        Seq(delRows.length.toLong, delRows.map(_.nRows).sum))
    }

    private val outSchema = StructType(Seq(
      StructField("delete_files_compacted", LongType),
      StructField("delete_keys_folded", LongType)))
  }

  private class OptimizeProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "optimize"
    override def description(): String =
      "bin-pack files under target_rows into one rewrite commit; " +
        "zorder => array(2-4 numeric/date/string cols) re-clusters the " +
        "layout on the interleave key"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_rows", LongType).build(),
      // K45: OPTIMIZE ... ZORDER — two numeric column names whose
      // bit-interleaved key (T16's curve) orders the rewrite
      ProcedureParameter.in("zorder", ArrayType(StringType))
        .defaultValue("array()").build(),
      // K54: scope the rewrite to files that MAY hold matching rows
      // (the K35 stat comparator decides) — Iceberg's
      // rewrite_data_files(filter). At 100 TB a full-table ZORDER is a
      // table-sized job; a where-scoped one converges the layout
      // incrementally, partition by partition, with every out-of-range
      // file carried by reference.
      ProcedureParameter.in("where", StringType).defaultValue("''").build())

    /** Parse + resolve the `where` argument against the table schema
      * and translate it to the V1 filter the K35 comparator prunes on.
      * Untranslatable predicates refuse loudly: silently rewriting
      * everything would be correct but would defeat the scoping the
      * caller asked for.
      */
    private def scopeFilter(session: SparkSession, schema: StructType,
                            where: String)
        : Option[org.apache.spark.sql.sources.Filter] = {
      if (where.trim.isEmpty) return None
      val df = session.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .where(org.apache.spark.sql.functions.expr(where))
      // fold the implicit literal casts analysis inserts (`r = 2` is
      // analyzed as `r = CAST(2 AS BIGINT)`, which translateFilter
      // refuses) — the full optimizer can't run here because it would
      // collapse the empty dummy relation and the Filter with it
      val folded = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(
        df.queryExecution.analyzed)
      val cond = folded.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.getOrElse(throw new IllegalArgumentException(
        s"OPTIMIZE where '$where': not a filter predicate"))
      Some(org.apache.spark.sql.execution.datasources.DataSourceStrategy
        .translateFilter(cond, supportNestedPredicatePushdown = true)
        .getOrElse(throw new IllegalArgumentException(
          s"OPTIMIZE where '$where': predicate is not translatable to a " +
            "stats-prunable filter (use comparisons/IN/AND/OR on table columns)")))
    }

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val target = input.getLong(1)
      val zorder: Seq[String] =
        if (input.isNullAt(2)) Seq.empty
        else input.getArray(2).toObjectArray(StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
      val where =
        if (input.isNullAt(3)) "" else input.getUTF8String(3).toString
      val (dir, fullMeta) = resolveFull(catalogName, root, table)
      val (schema, bucketSpec) = (fullMeta.schema, fullMeta.bucket)
      val specId = fullMeta.currentSpecId
      val manBase = s"$dir/manifest"
      val session = spark
      val scope = scopeFilter(session, schema, where)
      val current = ManifestStore.versions(session, manBase).lastOption
        .map(v => GraftLakeTable.manifestRowsFull(session, manBase, v))
        .getOrElse(Seq.empty)
      // K39/K42 guard: packing a merge-on-read data file would give it
      // a NEW identity, detaching the equality/position deletes that
      // masked its rows — the masked rows would resurrect. Compact
      // deletes first (`CALL system.compact_deletes`), then OPTIMIZE.
      if (current.exists(r => GraftDeltaOperation.isDeleteFile(r.file)))
        throw new UnsupportedOperationException(
          s"OPTIMIZE on $table: table has live delete files — " +
            "compact them first (CALL system.compact_deletes), then OPTIMIZE")
      if (zorder.nonEmpty)
        return zorderRewrite(session, table, dir, schema, bucketSpec,
          current, target, zorder, specId, scope)
      // K50: OPTIMIZE is also the spec-convergence rewrite — files
      // written under an OLD bucket spec count as rewrite candidates
      // regardless of size, so one full-target OPTIMIZE re-routes the
      // whole layout under the current spec and SPJ comes back.
      // A `where` scope (K54) restricts candidates to files the stat
      // comparator cannot prove scope-free — out-of-scope files carry
      // by reference no matter how small.
      val (small, big) = current.partition(r =>
        (r.nRows < target || r.spec != specId) &&
          scope.forall(f => GraftGroupScan.mayMatch(schema, r.stats, f)))
      // 0 or 1 small file: nothing to pack — report without committing
      // (unless that one file is on an OLD spec: re-routing it IS work)
      if (small.isEmpty ||
          (small.length == 1 && small.head.spec == specId))
        return resultScan(outSchema, Seq(0L, current.length.toLong, 0L))
      val writerId = java.util.UUID.randomUUID().toString.take(12)
      val dataDir = s"$dir/data_$writerId"
      val packed = session.read.schema(schema)
        .parquet(small.map(r => GraftLakeTable.resolveFile(dir, r.file)): _*)
        .coalesce(math.max(1, (small.map(_.nRows).sum / math.max(1L, target)).toInt))
      GraftLakeTable.writeData(dataDir, packed, bucketSpec)
      GraftLakeTable.commitReplace(session, dir, dataDir,
        small.map(_.file).toSet, schema, bucketSpec.isDefined,
        s"OPTIMIZE $table", specId = specId)
      val after = GraftLakeTable.manifestRowsFull(session, manBase,
        ManifestStore.versions(session, manBase).last)
      resultScan(outSchema,
        Seq(small.length.toLong, big.length.toLong,
          (after.length - big.length).toLong))
    }

    /** K45: `CALL graft.system.optimize(t, target, zorder =>
      * array('x','y'[,...]))` — rewrite the WHOLE layout ordered by
      * T16's bit-interleaved curve over 2–4 dimensions: each column is
      * mapped to an order-preserving numeric proxy, min/max-normalized
      * to 10 bits (one metadata-sized aggregate), the zkey interleaves
      * them round-robin, and a range-repartition on zkey lands one
      * curve segment per file. The manifest's per-file min/max stats
      * (K35) then bound EVERY dimension per file, so an N-D box
      * predicate prunes to the files whose curve segment crosses the
      * box — rectangle skipping from the same stats that previously
      * only pruned one sorted dimension (the Delta/Iceberg OPTIMIZE
      * ZORDER shape; the 2-D and 3-D pruning laws are spec-pinned).
      *
      * Proxies follow K35's comparator orders exactly (round-12
      * generalization past 2 numeric dims):
      *   - numerics cast to double;
      *   - DATE becomes its epoch-day number (the comparator's ISO
      *     order is the day order);
      *   - STRING becomes its unsigned 6-byte UTF-8 prefix (hex is
      *     monotone in unsigned byte order; 48 bits stays exact in a
      *     double) — longer shared prefixes collapse into one curve
      *     cell, which only costs pruning resolution, never rows.
      * Timestamps and nested types are refused loudly: K35 keeps no
      * stats for them, so a zorder on them could never prune.
      *
      * Same replace-commit and conflict semantics as bin-packing;
      * `target_rows` sizes the output files.
      */
    private def zorderRewrite(session: SparkSession, table: String,
                              dir: String, schema: StructType,
                              bucketSpec: Option[(String, Int)],
                              allCurrent: Seq[GraftLakeTable.ManifestRow],
                              target: Long,
                              zorder: Seq[String],
                              specId: Long = 0L,
                              scope: Option[org.apache.spark.sql.sources.Filter] = None)
        : java.util.Iterator[Scan] = {
      import org.apache.spark.sql.functions._
      require(zorder.length >= 2 && zorder.length <= 4,
        s"zorder takes 2 to 4 column names (got ${zorder.mkString(", ")})")
      require(bucketSpec.isEmpty,
        "OPTIMIZE ZORDER on a bucketed table would break its bucket routing")
      // K54: a where-scoped ZORDER rewrites ONLY the files the K35
      // comparator cannot prove scope-free; the rest carry by
      // reference (commitReplace's carried = current − replaced).
      // Curve bounds are normalized over the SCOPED data — each scoped
      // rewrite is locally optimal, and repeated scoped calls converge
      // the layout region by region (Iceberg rewrite_data_files(filter)
      // semantics).
      val (current, outOfScope) = scope match {
        case None => (allCurrent, Seq.empty[GraftLakeTable.ManifestRow])
        case Some(f) => allCurrent.partition(r =>
          GraftGroupScan.mayMatch(schema, r.stats, f))
      }
      val proxies: Seq[org.apache.spark.sql.Column] = zorder.map { c =>
        val f = schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"zorder column '$c' is not in the table schema"))
        f.dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            col(s"`$c`").cast("double")
          case org.apache.spark.sql.types.DateType =>
            unix_date(col(s"`$c`")).cast("double")
          case org.apache.spark.sql.types.StringType =>
            conv(rpad(substring(hex(col(s"`$c`").cast("binary")), 1, 12),
              12, "0"), 16, 10).cast("double")
          case other => throw new IllegalArgumentException(
            s"zorder column '$c' must be numeric, DATE or STRING " +
              s"(got ${other.simpleString}) — K35 keeps no stats for " +
              "other types, so they could never prune")
        }
      }
      if (current.isEmpty)
        return resultScan(outSchema, Seq(0L, outOfScope.length.toLong, 0L))
      val data = session.read.schema(schema)
        .parquet(current.map(r => GraftLakeTable.resolveFile(dir, r.file)): _*)
      // one metadata-sized aggregate normalizes every dim to 10 bits
      val aggs = proxies.flatMap(p => Seq(min(p), max(p)))
      val b = data.agg(aggs.head, aggs.tail: _*).head()
      if (proxies.indices.exists(i => b.isNullAt(2 * i)))
        return resultScan(outSchema,
          Seq(0L, (current.length + outOfScope.length).toLong, 0L))
      val norms = proxies.zipWithIndex.map { case (p, i) =>
        val (lo, hi) = (b.getDouble(2 * i), b.getDouble(2 * i + 1))
        if (hi == lo) lit(0L)
        else least(lit(1023L), greatest(lit(0L),
          floor((p - lit(lo)) / lit(hi - lo) * 1024.0).cast("long")))
      }
      val d = norms.length
      val zkey = (0 until 10).foldLeft(lit(0L)) { (acc, bit) =>
        norms.zipWithIndex.foldLeft(acc) { case (a, (n, i)) =>
          a + shiftleft(shiftright(n, bit).bitwiseAND(lit(1L)), d * bit + i)
        }
      }
      val totalRows = current.map(_.nRows).sum
      val nFiles = math.max(1, math.ceil(
        totalRows.toDouble / math.max(1L, target)).toInt)
      val writerId = java.util.UUID.randomUUID().toString.take(12)
      val dataDir = s"$dir/data_$writerId"
      val clustered = data.withColumn("__graft_zkey", zkey)
        .repartitionByRange(nFiles, col("__graft_zkey"))
        .sortWithinPartitions("__graft_zkey")
        .drop("__graft_zkey")
      GraftLakeTable.writeData(dataDir, clustered, None)
      GraftLakeTable.commitReplace(session, dir, dataDir,
        current.map(_.file).toSet, schema, bucketed = false,
        s"OPTIMIZE ZORDER $table", specId = specId)
      val manBase = s"$dir/manifest"
      val after = GraftLakeTable.manifestRowsFull(session, manBase,
        ManifestStore.versions(session, manBase).last)
      resultScan(outSchema,
        Seq(current.length.toLong, outOfScope.length.toLong,
          (after.length - outOfScope.length).toLong))
    }

    private val outSchema = StructType(Seq(
      StructField("rewritten_files", LongType),
      StructField("carried_files", LongType),
      StructField("new_files", LongType)))
  }

  /** K50: `CALL graft.system.set_bucketing(table, col, n)` —
    * PARTITION-TRANSFORM EVOLUTION on the catalog, the Iceberg
    * `ALTER TABLE ... WRITE ORDERED/PARTITIONED` shape on the CALL
    * surface (no SQL-parser extension needed). A METADATA-ONLY meta
    * swap appends a new bucket spec to the table's spec history and
    * makes it current; `n = 0` (or col `'none'`) evolves to flat.
    *
    * Old files are NEVER rewritten: each file keeps the routing of the
    * spec it was written under, identified by the per-file `spec` id
    * its manifest row carries — a per-ROW tag, not a version cutoff,
    * so an INSERT racing the evolution stays correctly labeled with
    * the spec it actually routed by. While specs are mixed the scan
    * degrades from key-grouped (SPJ) to the flat stat-pruned read —
    * correct at all times, co-location suspended; `CALL
    * system.optimize` counts old-spec files as rewrite candidates
    * regardless of size, so one OPTIMIZE converges the layout and SPJ
    * comes back under the new spec. At 100 TB: re-bucketing a table is
    * one metadata write now + an incremental rewrite whenever (or
    * never), instead of a synchronous full-table rewrite.
    *
    * Refusals: merge-on-read tables (either mode — their row-id
    * layout is the delete files' addressing scheme), non-BIGINT or
    * unknown columns, n < 1 with a named column, and a no-op spec
    * (asking for the current spec is almost certainly a mistake).
    */
  private class SetBucketingProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "set_bucketing"
    override def description(): String =
      "evolve the table's bucket spec (metadata-only; old files keep " +
        "their routing; n=0 or col 'none' evolves to flat)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("col", StringType).build(),
      ProcedureParameter.in("n", IntegerType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val colArg =
        if (input.isNullAt(1)) "none" else input.getUTF8String(1).toString
      val n = if (input.isNullAt(2)) 0 else input.getInt(2)
      // read-modify-rename under the JVM meta-swap lock (shared with
      // ALTER TABLE — the other meta editor); cross-driver edits keep
      // the conditional-PUT rename contract (review finding, round 12).
      // The lock key is pure path arithmetic — no meta read outside
      // the lock (review pass 2)
      GraftTableMeta.withMetaSwapLock(
        new Path(tableDirOf(root, table), "_graft_table.json").toString) {
      val (dir, m) = resolveFull(catalogName, root, table)
      require(m.morKey.isEmpty && !m.morPos,
        s"set_bucketing on $table: merge-on-read tables keep their " +
          "row-id layout — bucketing evolution is refused")
      // a transaction WORKSPACE must refuse meta edits (review pass 3,
      // round 14): the commit pin verifies only the SOURCE meta, so a
      // workspace-local spec evolution would pass the pin and publish
      // rows tagged with a spec id the source's history doesn't have —
      // breaking every later spec-routed read. Evolve the SOURCE
      // (which aborts open transactions through the metaSha pin), not
      // the workspace.
      require(!fileSystem(root).exists(new Path(dir, TxnMarkerFile)),
        s"set_bucketing on $table: transaction workspaces refuse meta " +
          "edits — evolve the source table instead (open transactions " +
          "then abort at commit through the meta pin)")
      val newSpec: Option[(String, Int)] =
        if (colArg.isEmpty || colArg.equalsIgnoreCase("none") || n == 0) None
        else {
          require(n >= 1, s"set_bucketing on $table: n must be >= 1 (got $n)")
          val field = m.schema.fields.find(_.name == colArg).getOrElse(
            throw new IllegalArgumentException(
              s"set_bucketing on $table: bucket column '$colArg' is not " +
                "in the table schema"))
          require(field.dataType == LongType,
            s"set_bucketing on $table: bucket column '$colArg' must be " +
              s"BIGINT (got ${field.dataType.simpleString})")
          Some((colArg, n))
        }
      require(newSpec != m.bucket,
        s"set_bucketing on $table: the table already has this spec " +
          s"(${m.bucket.fold("flat")(s => s"bucket(${s._2}, ${s._1})")})")
      val newId = m.bucketSpecs.map(_._1).max + 1
      val specs = m.bucketSpecs :+ ((newId, newSpec))
      // the same temp-write + OVERWRITE-rename swap ALTER TABLE uses:
      // readers see the old or the new spec history, never a torn meta
      val fs = fileSystem(root)
      val metaPath = new Path(dir, "_graft_table.json")
      val tmp = new Path(dir,
        s".meta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(GraftTableMeta.evoText(m.schema, specs, newId).getBytes("UTF-8"))
      finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(metaPath.toUri, spark.sessionState.newHadoopConf())
        .rename(tmp, metaPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      resultScan(setBucketingOut,
        Seq(newId, (specs.length - 1).toLong))
      }
    }

    private val setBucketingOut = StructType(Seq(
      StructField("spec_id", LongType),
      StructField("prior_specs", LongType)))
  }

  /** K51: SNAPSHOT-ISOLATED MULTI-STATEMENT TRANSACTIONS on the
    * catalog — the branch-and-squash shape on the CALL surface:
    *
    * {{{
    *   CALL graft.system.begin_txn('lake.t')   -- -> 'lake.t__txn_<id>'
    *   INSERT INTO graft.lake.t__txn_<id> ...   -- any number of
    *   DELETE FROM graft.lake.t__txn_<id> ...   -- ordinary SQL DML
    *   MERGE INTO graft.lake.t__txn_<id> ...    -- statements
    *   CALL graft.system.commit_txn('lake.t', 'lake.t__txn_<id>')
    * }}}
    *
    * `begin_txn` creates a REAL catalog table whose first manifest
    * version carries the source's current snapshot BY REFERENCE
    * (every file as `../<table>/<rel>` — zero data copied, stats and
    * bytes preserved so pruning and K49 statistics keep working), plus
    * a `_graft_txn.json` marker pinning the base version. Statements
    * against the txn table are ordinary catalog DML: they see the base
    * snapshot plus their own effects (snapshot isolation by
    * construction), while readers and writers of the SOURCE table
    * proceed untouched — the txn table is just another table.
    *
    * `commit_txn` is the atomic squash: it verifies the source still
    * sits at the pinned base version (optimistic concurrency — a
    * concurrent commit on the source ABORTS the transaction with a
    * named error, never merges silently), MOVES the txn table's fresh
    * write dirs into the source dir (directory renames, the RTAS
    * commit shape), and publishes ONE manifest version on the source:
    * carried references stripped back to plain relative paths + the
    * fresh files. Readers of the source see the whole multi-statement
    * effect at exactly one version boundary or not at all. A commit
    * that loses the final CAS (a racer landed between the check and
    * the publish) aborts with the moved files left UNREFERENCED under
    * the source — invisible to every reader, reclaimed by VACUUM, the
    * same contract as any failed writer. `abort_txn` discards the
    * workspace (a metadata-dir delete — the referenced source files
    * are outside it and untouched).
    *
    * At 100 TB: begin costs one manifest read + one metadata publish
    * (zero data IO regardless of table size); the statements cost what
    * they cost; commit costs the fresh dirs' renames + one CAS
    * publish.
    *
    * Scope v2 (K52): BUCKETED tables participate (the workspace copies
    * the source's full meta so the bucket router routes DML
    * identically, and carried references keep their
    * `__graft_bucket=<i>` path component, so `HasPartitionKey` reads
    * stay storage-partitioned); MoR and spec-evolved tables still
    * refuse (their mask/spec machinery would need spec-aware carries).
    * And transactions span MULTIPLE tables: `begin_txn('lake.a,
    * lake.b')` opens one workspace per table under one transaction id,
    * and commit runs a TWO-PHASE group commit — phase 1 claims each
    * table's next version as a PENDING claim (atomic rename carrying a
    * `_pending_<txnId>` marker; readers suppress it, concurrent CAS
    * writers block behind it — [[graft.sinks.ManifestStore]]), phase 2
    * flips every claim visible with ONE create-exclusive journal file
    * (`<root>/.txn_journal/committed_<txnId>`) — the single atomic
    * commit point, the same shape as an Iceberg REST catalog's
    * multi-table CAS. Readers of all group tables see the whole
    * transaction or none of it. A crash between phases leaves
    * suppressed claims that VACUUM aborts after the staging grace; a
    * crash after the journal commit leaves a DURABLE transaction whose
    * claims the first reader finalizes lazily.
    */
  private val TxnMarkerFile = "_graft_txn.json"
  // baseMs = the base version's commit instant, -1 for an empty base
  // (a bare version NUMBER is not a snapshot identity: a
  // drop-and-recreate restarts the history and can land on the same
  // number — the instant pins the actual snapshot; review pass 3);
  // metaSha pins the source's FULL meta file (schema + bucket spec
  // history) the workspace was opened on — SHA-256, not
  // String.hashCode: a 32-bit collision would let a concurrent
  // ALTER/set_bucketing pass the commit check (advice, round 12);
  // txnId + group tie the workspace to its transaction group, so a
  // commit of a strict subset of the group refuses.
  private val TxnMarkerRe =
    """\{"source":"([^"]+)","base":(\d+),"baseMs":(-?\d+),"metaSha":"([0-9a-f]+)","txnId":"([A-Za-z0-9]+)","group":"([^"]+)"\}""".r

  private def sha256Hex(txt: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def parseTableList(arg: String): Seq[String] = {
    val ts = arg.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(ts.nonEmpty, s"empty table list: '$arg'")
    require(ts.distinct.length == ts.length, s"duplicate tables in '$arg'")
    ts
  }

  private def rawMetaText(root: String, dir: String): String = {
    val fs = fileSystem(root)
    val in = fs.open(new Path(dir, "_graft_table.json"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def journalDir(root: String): Path = new Path(root, ".txn_journal")

  private case class TxnMarker(source: String, base: Long, baseMs: Long,
                               metaSha: String, txnId: String, group: String)

  private def readMarker(root: String, txnDir: String): TxnMarker = {
    val fs = fileSystem(root)
    val markerPath = new Path(txnDir, TxnMarkerFile)
    require(fs.exists(markerPath),
      s"${new Path(txnDir).getName} is not a transaction workspace (no $TxnMarkerFile)")
    val in = fs.open(markerPath)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.trim match {
      case TxnMarkerRe(s, b, ms, sha, id, g) =>
        TxnMarker(s, b.toLong, ms.toLong, sha, id, g)
      case other => throw new IllegalStateException(
        s"unreadable transaction marker: $other")
    }
  }

  private class BeginTxnProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "begin_txn"
    override def description(): String =
      "open a snapshot-isolated transaction workspace for a table"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val tables = parseTableList(input.getUTF8String(0).toString)
      tables.foreach(t => require(!t.contains("__txn_"),
        s"begin_txn on $t: transactions do not nest"))
      val resolved = tables.map(t => (t, resolveFull(catalogName, root, t)))
      resolved.foreach { case (t, (_, m)) =>
        // K39 EQUALITY-delete MoR tables participate (r14 #5): their
        // delete files are self-contained (key values + seq), so they
        // carry by reference with seq intact — the workspace is seeded
        // at the SOURCE's version number, so every sequence comparison
        // (delete masks strictly-older data) replays identically inside
        // the workspace and back onto the source at commit. POSITION-
        // delete tables still refuse: a posdel file addresses its data
        // file BY PATH, and a carried reference renames the path, which
        // silently detaches the mask (the same identity hazard OPTIMIZE
        // refuses on).
        require(!m.morPos,
          s"begin_txn on $t: position-delete merge-on-read tables refuse " +
            "(position-delete files address data files by path; a carried " +
            "'../' reference renames the path and detaches the mask); " +
            "every other table mode participates")
        // SPEC-EVOLVED tables participate (r14, closing the last
        // refusal-matrix row): the workspace meta is a byte copy of
        // the source's (full spec history + current id — DML routes
        // identically), carried manifest rows keep their per-file
        // `spec` tag verbatim, fresh commits stamp the current spec,
        // and both squash and replay preserve `spec` through the
        // publish — there is nothing spec-shaped left to carry
        // specially. A set_bucketing racing the transaction aborts
        // the commit through the metaSha pin, same as ALTER.
      }
      val session = spark
      // the FULL uuid (dashes stripped -> 32 hex chars, 128 bits): the
      // txn id keys journal commit files and pending-claim visibility,
      // so it must be collision-free for the lake's lifetime — an
      // 8-char/32-bit id reaches ~1% birthday-collision odds within
      // ~9k group commits (review pass 1, round 13)
      val txnId = java.util.UUID.randomUUID().toString.replace("-", "")
      val group = tables.mkString(",")
      val fs = fileSystem(root)
      val created = scala.collection.mutable.ArrayBuffer[Path]()
      // all-or-nothing: a failure opening any workspace (including a
      // failed seed, which a later commit could misread as "empty net
      // effect" — review pass 3) drops every workspace already created
      val outRows =
        try resolved.map { case (table, (dir, _)) =>
          val leaf = table.split('.').last
          val txnTable = s"${table}__txn_$txnId"
          val txnDir = new Path(new Path(dir).getParent, s"${leaf}__txn_$txnId")
          fs.mkdirs(txnDir)
          created += txnDir
          // the FULL meta text (schema + bucket wrapper) so a bucketed
          // source's workspace routes DML identically (K52)
          val rawMeta = rawMetaText(root, dir)
          val meta = fs.create(new Path(txnDir, "_graft_table.json"), false)
          try meta.write(rawMeta.getBytes("UTF-8")) finally meta.close()
          val manBase = s"$dir/manifest"
          val base = ManifestStore.versions(session, manBase).lastOption.getOrElse(0L)
          val baseMs =
            if (base == 0L) -1L
            else ManifestStore.versionsWithTimes(session, manBase)
              .find(_._1 == base).map(_._2).getOrElse(-1L)
          val marker = fs.create(new Path(txnDir, TxnMarkerFile), false)
          try marker.write(
            s"""{"source":"$table","base":$base,"baseMs":$baseMs,"metaSha":"${sha256Hex(rawMeta)}","txnId":"$txnId","group":"$group"}"""
              .getBytes("UTF-8"))
          finally marker.close()
          if (base > 0L) {
            val rows = GraftLakeTable.manifestRowsFull(session, manBase, base)
            val seeded = GraftLakeTable.publishRows(session,
              rows.map(r => r.copy(file = s"../$leaf/${r.file}", txn = "")))
            // seed at the SOURCE's version number (not 1): workspace
            // DML then commits at base+1, base+2, … with per-row seq
            // EQUAL to what the rows will carry on the source — the
            // identity mapping that makes MoR sequence comparisons
            // (delete masks strictly-older data) replay bit-for-bit
            // inside the workspace and across the commit (r14 #5)
            require(ManifestStore.tryPublish(session, s"$txnDir/manifest", seeded, base),
              s"begin_txn on $table: could not seed the workspace manifest")
          }
          Seq[Any](UTF8String.fromString(txnTable), base)
        } catch { case e: Throwable =>
          created.foreach(d =>
            try fs.delete(d, true) catch { case _: Throwable => () })
          throw e
        }
      resultScanRows(beginOut, outRows)
    }

    private val beginOut = StructType(Seq(
      StructField("txn_table", StringType),
      StructField("base_version", LongType)))
  }

  private class CommitTxnProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "commit_txn"
    override def description(): String =
      "atomically publish a transaction workspace's net effect onto " +
        "its source table (aborts if the source moved past the base)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("txn_table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val tables = parseTableList(input.getUTF8String(0).toString)
      val txnTables = parseTableList(input.getUTF8String(1).toString)
      require(tables.length == txnTables.length,
        s"commit_txn: ${tables.length} tables vs ${txnTables.length} " +
          "workspaces — the lists pair positionally")
      val session = spark
      val fs = fileSystem(root)

      case class Part(table: String, dir: String, txnDir: String,
                      mk: TxnMarker, meta: GraftTableMeta.TableMeta)
      val parts = tables.zip(txnTables).map { case (table, txnTable) =>
        val (dir, m) = resolveFull(catalogName, root, table)
        val (txnDir, _) = resolveFull(catalogName, root, txnTable)
        val mk = readMarker(root, txnDir)
        require(mk.source == table,
          s"commit_txn: $txnTable was opened on '${mk.source}', not '$table'")
        Part(table, dir, txnDir, mk, m)
      }
      val txnId = parts.head.mk.txnId
      require(parts.forall(_.mk.txnId == txnId),
        "commit_txn: the workspaces belong to different transactions " +
          s"(${parts.map(_.mk.txnId).distinct.mkString(", ")})")
      // a strict subset of the group must refuse: partial visibility is
      // exactly what the group commit exists to prevent
      require(tables.toSet == parts.head.mk.group.split(',').toSet,
        s"commit_txn: transaction $txnId spans '${parts.head.mk.group}' — " +
          "all group tables commit together")
      val journal = journalDir(root)

      // carried vs fresh at a committed version: carried rows keep
      // their source seq (≤ base), anything the transaction added has
      // seq > base — one definition that covers both the squash (all
      // fresh at base+1) and the MoR multi-version replay
      def countsAt(p: Part, v: Long): (Long, Long) = {
        val rows = GraftLakeTable.manifestRowsFull(session, s"${p.dir}/manifest", v)
        val fresh = rows.count(_.seq > p.mk.base).toLong
        (rows.length - fresh, fresh)
      }
      def dropWorkspaces(): Unit = parts.foreach(p =>
        try fs.delete(new Path(p.txnDir), true) catch { case _: Throwable => () })

      // eager finalize + journal retirement, ORDERED for retry
      // idempotence (review pass 2, round 13): (1) finalize markers —
      // visibility stops depending on the journal; (2) drop the
      // workspaces — the retry handle goes away only after the claims
      // are self-standing; (3) LAST, retire the journal file. Any
      // crash before (2) leaves a retryable state (journal + workspaces
      // both present → the committed-retry path below); a crash
      // between (2) and (3) leaks a journal file — retired by VACUUM's
      // age-gated journal sweep, never load-bearing (its markers are
      // already gone). Deleting the journal any earlier re-opened a
      // double-apply window: a retried, durably-committed commit_txn
      // would have failed pin verification with 'source moved — abort
      // and retry', inviting the caller to apply the DML twice.
      // Finalization is CRUMB-SCAN based: a MoR transaction claims one
      // version PER STATEMENT (r14 #5), so the claims are whatever
      // pending breadcrumbs exist, not just base+1.
      def finalizeMarkers(): Unit = parts.foreach { p =>
        val mb = s"${p.dir}/manifest"
        ManifestStore.pendingClaims(session, mb, txnId)
          .foreach(v => ManifestStore.finalizePending(session, mb, v, txnId))
      }
      def retireJournal(): Unit =
        try fs.delete(new Path(journal, s"committed_$txnId"), false)
        catch { case _: Exception => () }

      // a RETRY after a crash past the journal commit point: the
      // transaction is already durable — finalize and report THIS
      // transaction's committed versions. The versions come from the
      // WORKSPACE manifests (still present on every retry path — the
      // parts resolution above requires them), never from "the
      // source's newest version": a later unrelated commit would
      // otherwise be reported as this transaction's result (review
      // pass 1, round 14).
      if (fs.exists(new Path(journal, s"committed_$txnId"))) {
        finalizeMarkers()
        val out = parts.map { p =>
          val last =
            if (p.meta.morKey.nonEmpty)
              ManifestStore.versions(session, s"${p.txnDir}/manifest")
                .filter(_ > p.mk.base).lastOption.getOrElse(p.mk.base)
            else p.mk.base + 1
          val (c, f) = if (last > p.mk.base) countsAt(p, last) else (0L, 0L)
          Seq[Any](last, c, f)
        }
        dropWorkspaces()
        retireJournal()
        return resultScanRows(commitOut, out)
      }

      // pin verification for EVERY table before any mutation
      parts.foreach { p =>
        val manBase = s"${p.dir}/manifest"
        val latest = ManifestStore.versions(session, manBase).lastOption.getOrElse(0L)
        if (latest != p.mk.base)
          throw new IllegalStateException(
            s"commit_txn on ${p.table}: the source moved to v$latest past " +
              s"the transaction's base v${p.mk.base} — the transaction " +
              "cannot merge silently; abort_txn and retry on the new base")
        // a version NUMBER is not a snapshot identity: a drop-and-
        // recreate restarts the history and can land on the same number
        // while the carried file references point at deleted files — the
        // base version's commit INSTANT and the source meta pin the
        // actual snapshot the workspace was opened on (review pass 3)
        if (p.mk.base > 0L) {
          val nowMs = ManifestStore.versionsWithTimes(session, manBase)
            .find(_._1 == p.mk.base).map(_._2).getOrElse(-2L)
          require(nowMs == p.mk.baseMs,
            s"commit_txn on ${p.table}: the source is not the table the " +
              s"transaction was opened on (base v${p.mk.base} commit " +
              s"instant moved ${p.mk.baseMs} -> $nowMs — dropped and " +
              "recreated?); abort_txn and reopen")
        }
        require(sha256Hex(rawMetaText(root, p.dir)) == p.mk.metaSha,
          s"commit_txn on ${p.table}: the source schema changed since " +
            "begin_txn (ALTER or set_bucketing) — abort_txn and reopen " +
            "on the current schema")
      }

      // per-table prep: net-effect rows + idempotent dir moves. Two
      // shapes (r14 #5):
      //   - plain/bucketed tables SQUASH — one publish at base+1, all
      //     fresh rows stamped seq base+1 (the branch-and-squash shape,
      //     unchanged);
      //   - equality-MoR tables REPLAY — one publish per workspace
      //     STATEMENT version, rows verbatim (carry prefix stripped,
      //     txn tags cleared, seq KEPT — the seed-at-base numbering
      //     makes workspace seqs identical to the source seqs they
      //     land as), because collapsing statements onto one seq would
      //     re-order equality-delete masking: a delete at seq s masks
      //     strictly-older data, so an insert-then-delete transaction
      //     squashed to one seq resurrects the inserted rows.
      case class Pub(version: Long, manifest: org.apache.spark.sql.DataFrame)
      case class Prepared(p: Part, pubs: Seq[Pub], lastVersion: Long,
                          carried: Long, fresh: Long)
      val prepared = parts.map { p =>
        val leaf = p.table.split('.').last
        val carryPrefix = s"../$leaf/"
        val txnMan = s"${p.txnDir}/manifest"
        val txnVersions = ManifestStore.versions(session, txnMan)
        // a workspace whose seed never landed (interrupted begin) must
        // REFUSE, not publish a zero-file version over a non-empty
        // source (review pass 3 — the silent-wipe path)
        require(p.mk.base == 0L || txnVersions.nonEmpty,
          s"commit_txn on ${p.table}: ${new Path(p.txnDir).getName} has " +
            "no seeded manifest (interrupted begin_txn?) — abort_txn and reopen")
        // fresh write dirs move under the SOURCE dir (the RTAS commit
        // shape) — their table-relative paths are then valid verbatim.
        // The move is IDEMPOTENT per dir: a driver crash between moves
        // and the publish leaves some dirs already under the source,
        // and a retried commit_txn must complete rather than die on a
        // "collision" with its own half-finished work (advice, round
        // 12). source-gone + target-present can only mean "this
        // workspace's earlier attempt moved it" — write dirs are named
        // by writer UUID, so no other writer can have created the target.
        def moveDirs(freshDirs: Seq[String]): Unit = freshDirs.foreach { d =>
          val source = new Path(p.txnDir, d)
          val target = new Path(p.dir, d)
          if (fs.exists(source)) {
            require(!fs.exists(target),
              s"commit_txn on ${p.table}: write-dir collision on $d")
            if (!fs.rename(source, target))
              throw new java.io.IOException(
                s"commit_txn on ${p.table}: failed to move workspace dir $d")
          } else require(fs.exists(target),
            s"commit_txn on ${p.table}: workspace dir $d is missing from " +
              "both the workspace and the source — the transaction is " +
              "corrupt; abort_txn and retry")
        }
        def mapRows(rows: Seq[GraftLakeTable.ManifestRow]) = rows.map { r =>
          if (r.file.startsWith(carryPrefix))
            r.copy(file = r.file.stripPrefix(carryPrefix), txn = "")
          else r.copy(txn = "")
        }
        val mor = p.meta.morKey.nonEmpty
        if (mor) {
          // statement versions = everything the transaction committed
          // above the seed; each replays onto the source at ITS OWN
          // number (seed-at-base makes that the identity), so time
          // travel and CDF see per-statement granularity and every
          // seq comparison is preserved bit-for-bit
          val stmtVersions = txnVersions.filter(_ > p.mk.base)
          val rowsAt = stmtVersions.map(v =>
            v -> GraftLakeTable.manifestRowsFull(session, txnMan, v)).toMap
          // ALL statements' fresh dirs move (an intermediate version's
          // files must stay reachable for time travel), deduped
          moveDirs(stmtVersions.flatMap(v => rowsAt(v)
            .filterNot(_.file.startsWith(carryPrefix))
            .map(_.file.split('/').head)).distinct)
          val pubs = stmtVersions.map(v =>
            Pub(v, GraftLakeTable.publishRows(session, mapRows(rowsAt(v)))))
          val lastRows = stmtVersions.lastOption.map(rowsAt).getOrElse(Seq.empty)
          val freshN = lastRows.count(_.seq > p.mk.base).toLong
          Prepared(p, pubs, stmtVersions.lastOption.getOrElse(p.mk.base),
            lastRows.length - freshN, freshN)
        } else {
          val txnRows = txnVersions.lastOption
            .map(v => GraftLakeTable.manifestRowsFull(session, txnMan, v))
            .getOrElse(Seq.empty)
          val (carried, fresh) = txnRows.partition(_.file.startsWith(carryPrefix))
          moveDirs(fresh.map(_.file.split('/').head).distinct)
          val published = GraftLakeTable.publishRows(session,
            carried.map(r => r.copy(file = r.file.stripPrefix(carryPrefix), txn = "")) ++
              fresh.map(_.copy(txn = "", seq = p.mk.base + 1)))
          Prepared(p, Seq(Pub(p.mk.base + 1, published)), p.mk.base + 1,
            carried.length.toLong, fresh.length.toLong)
        }
      }

      // a transaction with no statements on any table: nothing to
      // publish — drop the workspaces and report the unchanged bases
      val allPubs: Seq[(Part, Pub)] =
        prepared.flatMap(pr => pr.pubs.map(pr.p -> _))
      if (allPubs.isEmpty) {
        dropWorkspaces()
        return resultScanRows(commitOut,
          prepared.map(pr => Seq[Any](pr.p.mk.base, 0L, 0L)))
      }

      {
        // two-phase commit for EVERY transaction — single-table ones
        // included (review pass 2, round 14): the former plain-CAS
        // single-publish path had no journal, so a crash between the
        // CAS and the workspace drop left a retry indistinguishable
        // from "source moved", whose error text invites re-applying
        // DML that already committed. The journal costs two small FS
        // ops and makes every commit retry-idempotent.
        // Phase 1: claim every publish's version — one per table for
        // squashes, one per STATEMENT for MoR replays, ascending per
        // table — as reader-suppressed PENDING claims.
        val claimed = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        val loser = allPubs.find { case (part, pub) =>
          val manBase = s"${part.dir}/manifest"
          val won = ManifestStore.tryPublishPending(session, manBase,
            pub.manifest, pub.version, txnId, journal.toString)
          if (won) claimed += ((manBase, pub.version))
          !won
        }
        if (loser.isDefined) {
          // phase-1 rollback: no claim ever became visible, so dropping
          // them is safe; moved files stay unreferenced until VACUUM
          claimed.foreach { case (mb, v) =>
            ManifestStore.abortPending(session, mb, v, txnId) }
          dropWorkspaces()
          throw new java.io.IOException(
            s"commit_txn on ${loser.get._1.table}: lost the publish race at " +
              s"v${loser.get._2.version} — the transaction is " +
              "aborted and its workspaces dropped; the moved files stay " +
              "unreferenced until VACUUM")
        }
        // phase 2 — THE commit point: one exclusively-created journal
        // file flips every table's claim visible at once. The file's
        // CONTENT is the group's table list, so VACUUM's journal sweep
        // (advice, round 14) can verify no group table still has a
        // pending claim before retiring a leaked journal — and the
        // content lands ATOMICALLY (temp write + rename; a crash
        // mid-write must not leave an existing-but-truncated journal
        // whose partial group list the sweep would trust — review
        // pass 2). A failed rename means another attempt of THIS txn
        // won the create race, which is the same committed state.
        fs.mkdirs(journal)
        val jTmp = new Path(journal,
          s".tmp_${txnId}_${java.util.UUID.randomUUID().toString.take(8)}")
        val jOut = fs.create(jTmp, true)
        try jOut.write(parts.head.mk.group.getBytes("UTF-8")) finally jOut.close()
        if (!fs.rename(jTmp, new Path(journal, s"committed_$txnId"))) {
          try fs.delete(jTmp, false) catch { case _: Exception => () }
          if (!fs.exists(new Path(journal, s"committed_$txnId")))
            throw new java.io.IOException(
              s"commit_txn: could not land journal committed_$txnId")
        }
        finalizeMarkers()
        // post-commit visibility verification (advice, round 14 — the
        // commit-side half of the abort_txn race): if an abort_txn
        // rolled our phase-1 claims back between the claim and the
        // journal point, the journal flip committed a transaction whose
        // versions no longer exist — reporting success would be a
        // silent lost commit. Verify every claimed version is actually
        // visible and fail loudly otherwise.
        // ONE visibility listing per table (not per publish — a MoR
        // replay has one publish per statement; review pass 3)
        allPubs.groupBy(_._1.table).foreach { case (_, pubs) =>
          val part = pubs.head._1
          val visible = ManifestStore.versions(session, s"${part.dir}/manifest")
          pubs.foreach { case (_, pub) =>
            if (!visible.contains(pub.version))
              throw new IllegalStateException(
                s"commit_txn on ${part.table}: the journal commit point was " +
                  s"reached but v${pub.version} is not visible — a concurrent " +
                  "abort_txn rolled back this transaction's claims between the " +
                  "phases; the transaction is LOST and must be re-run")
          }
        }
      }
      dropWorkspaces()
      retireJournal()
      resultScanRows(commitOut, prepared.map(pr =>
        Seq[Any](pr.lastVersion, pr.carried, pr.fresh)))
    }

    private val commitOut = StructType(Seq(
      StructField("version", LongType),
      StructField("carried_files", LongType),
      StructField("fresh_files", LongType)))
  }

  private class AbortTxnProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "abort_txn"
    override def description(): String =
      "discard a transaction workspace (the source table is untouched)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("txn_table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val txnTables = parseTableList(input.getUTF8String(0).toString)
      val fs = fileSystem(root)
      txnTables.foreach { txnTable =>
        val (txnDir, _) = resolveFull(catalogName, root, txnTable)
        require(fs.exists(new Path(txnDir, TxnMarkerFile)),
          s"abort_txn: $txnTable is not a transaction workspace")
        val mk = readMarker(root, txnDir)
        // a crash between a group commit's phases leaves reader-
        // suppressed pending claims on the source — roll them back
        // here (only while the journal has NOT committed; after the
        // commit point the claims are durable and only the workspace
        // is cleaned)
        if (!fs.exists(new Path(journalDir(root), s"committed_${mk.txnId}"))) {
          val srcMan = new Path(tableDirOf(root, mk.source), "manifest").toString
          val claims = ManifestStore.pendingClaims(spark, srcMan, mk.txnId)
          claims.foreach(v =>
            ManifestStore.abortPending(spark, srcMan, v, mk.txnId))
          val rolledBack = claims.nonEmpty
          // RE-CHECK the journal after the rollback (advice, round 14):
          // the exists-check above and abortPending are not atomic with
          // a concurrent commit_txn sitting between its phases — if the
          // journal holds committed_<txnId> NOW, this abort just rolled
          // back the claims of a COMMITTED transaction (the racer's
          // phase 2 landed mid-rollback) and the commit's versions will
          // never become visible. Fail LOUDLY so the torn state is
          // surfaced instead of reporting a clean abort over a silent
          // lost commit. (Claims aborted before the journal landed are
          // unaffected — for those the re-check still sees no journal.)
          if (rolledBack &&
              fs.exists(new Path(journalDir(root), s"committed_${mk.txnId}")))
            throw new IllegalStateException(
              s"abort_txn on $txnTable: a concurrent commit_txn reached its " +
                s"journal commit point for transaction ${mk.txnId} DURING this " +
                "abort's claim rollback — the committed transaction's claims " +
                "were rolled back and its versions are lost; the abort is " +
                "refused (workspace kept) so the state can be inspected")
        }
        fs.delete(new Path(txnDir), true)
      }
      resultScan(abortOut, Seq(txnTables.length.toLong))
    }

    private val abortOut = StructType(Seq(StructField("dropped", LongType)))
  }

  /** K55: `CALL graft.system.set_ref(table, name, kind[, version])` —
    * attach K38's branch/tag ref system to a CATALOG table: refs live
    * in a [[graft.sinks.RefStore]] lake at `<tableDir>/refs`, and any
    * SQL read resolves them via `VERSION AS OF '<name>'` (the
    * write-audit-publish workflow in plain SQL). `version` omitted (or
    * -1) pins the table's CURRENT head; an explicit pin must be a
    * committed version. Branches re-point freely (each flip an atomic
    * CAS commit on the ref lake); tags are immutable. At 100 TB every
    * ref operation is O(refs) metadata — no data file ever moves.
    */
  private class SetRefProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "set_ref"
    override def description(): String =
      "create or re-point a branch/tag ref on a catalog table " +
        "(readable via VERSION AS OF '<name>')"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("name", StringType).build(),
      ProcedureParameter.in("kind", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val refName = input.getUTF8String(1).toString
      val kind = input.getUTF8String(2).toString
      val versionArg = input.getLong(3)
      require(refName.nonEmpty && !refName.forall(_.isDigit),
        s"set_ref on $table: ref name '$refName' must be non-numeric " +
          "(an all-digit name would shadow VERSION AS OF <n> pins)")
      val (dir, _) = resolveFull(catalogName, root, table)
      val committed = ManifestStore.versions(spark, s"$dir/manifest")
      val v = if (versionArg < 0L) committed.lastOption.getOrElse(
        throw new IllegalStateException(
          s"set_ref on $table: the table has no committed version yet"))
      else versionArg
      require(committed.contains(v),
        s"set_ref on $table: v$v is not a committed version " +
          s"(available: ${committed.mkString(", ")})")
      graft.sinks.RefStore.set(spark, s"$dir/refs", refName, kind, v)
      resultScan(setRefOut, Seq(UTF8String.fromString(refName),
        UTF8String.fromString(kind), v))
    }

    private val setRefOut = StructType(Seq(
      StructField("name", StringType),
      StructField("kind", StringType),
      StructField("version", LongType)))
  }

  private class DropRefProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_ref"
    override def description(): String =
      "drop a branch/tag ref from a catalog table"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("name", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val refName = input.getUTF8String(1).toString
      val (dir, _) = resolveFull(catalogName, root, table)
      graft.sinks.RefStore.drop(spark, s"$dir/refs", refName)
      resultScan(dropRefOut, Seq(1L))
    }

    private val dropRefOut = StructType(Seq(StructField("dropped", LongType)))
  }

  /** `CALL graft.system.vacuum(table, keep)` — drop manifest versions
    * below latest−keep, then delete every data file no retained
    * version references. Readers pinned below the retention window
    * break by contract (K18/Delta's VACUUM semantics).
    */
  private class VacuumProcedure(catalogName: String, root: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "drop versions below latest-keep and GC unreferenced data files"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep", IntegerType).build(),
      // unreferenced-file GC grace (Delta/Iceberg's orphan-GC age
      // gate): an IN-FLIGHT writer lands files in its fresh
      // data_<writer> dir BEFORE publishing the manifest — with no
      // age threshold a concurrent vacuum sweeps them and the
      // writer's subsequent commit publishes a manifest referencing
      // deleted files, a permanently corrupt snapshot. Files younger
      // than the grace are skipped; pass 0 only on a quiesced table.
      ProcedureParameter.in("grace_hours", IntegerType)
        .defaultValue("24").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val keep = input.getInt(1)
      val graceHours = input.getInt(2)
      val (dir, _, _) = resolve(catalogName, root, table)
      val manBase = s"$dir/manifest"
      val session = spark
      // K55 refs FLOOR the retention cutoff (advice, round 14): a
      // branch/tag pins its version — and, through the referenced-set
      // arithmetic below, that version's data files — so expiring it
      // would break every `VERSION AS OF '<ref>'` read and followRef
      // stream at once (Iceberg's expire_snapshots retains ref-pinned
      // snapshots for the same reason). The effective keep widens to
      // cover the OLDEST ref-pinned version; dropping the ref is the
      // user's explicit way to let it expire.
      val refPins: Seq[Long] =
        if (!fileSystem(root).exists(new Path(dir, "refs"))) Seq.empty
        else graft.sinks.RefStore.refs(session, s"$dir/refs")
          .values.map(_._2).toSeq
      val effectiveKeep = refPins.minOption match {
        case Some(oldest) =>
          math.max(keep, ManifestStore.versions(session, manBase).count(_ >= oldest))
        case None => keep
      }
      val swept = ManifestStore.retain(session, manBase, effectiveKeep)
      val retained = ManifestStore.versions(session, manBase)
      val referenced = retained.flatMap(v =>
        GraftLakeTable.manifestRowsFull(session, manBase, v).map(_.file)).toSet
      val fs = fileSystem(root)
      // data files live under <dir>/data_<writer>[/bucket=...]/*.parquet;
      // K39 equality-delete files under <dir>/deletes_<writer>/ and
      // K42 position-delete files under <dir>/posdel_<writer>/ sweep
      // by the same referenced-by-a-retained-version rule
      val deleteCutoff = System.currentTimeMillis() - graceHours * 3600_000L
      val onDisk = fs.listStatus(new Path(dir)).toSeq
        .filter(st => st.isDirectory &&
          (st.getPath.getName.startsWith("data_") ||
            st.getPath.getName.startsWith("deletes_") ||
            st.getPath.getName.startsWith("posdel_")))
        .flatMap { d =>
          val it = fs.listFiles(d.getPath, true)
          val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
          while (it.hasNext) {
            val f = it.next()
            if (f.getPath.toString.endsWith(".parquet"))
              buf += ((f.getPath.toString, f.getModificationTime))
          }
          buf.toSeq
        }
      // manifest-relative path = from the file's own dir component —
      // data_<writer>, K39's deletes_<writer> and K42's posdel_<writer>
      // alike (matching on "/data_" alone classed every live delete
      // file as unreferenced and vacuumed it — review finding, round
      // 10); unreferenced files younger than the grace window stay
      // (an in-flight writer's pre-publish files — review, round 11)
      val doomed = onDisk.filter { case (abs, mtime) =>
        val idx = Seq(abs.lastIndexOf("/data_"), abs.lastIndexOf("/deletes_"),
          abs.lastIndexOf("/posdel_")).max
        val unreferenced =
          !(idx >= 0 && referenced.contains(abs.substring(idx + 1)))
        unreferenced && mtime < deleteCutoff
      }.map(_._1)
      doomed.foreach(f => fs.delete(new Path(f), false))
      // K41: staging dirs orphaned by DRIVER DEATH mid-CTAS/RTAS are
      // invisible, complete table copies under the namespace dir that
      // no in-process abort will ever reach — sweep the ones older
      // than the staging retention window (a LIVE staged build is
      // seconds-to-minutes old; 24h cannot race it)
      val nsDir = new Path(dir).getParent
      val stagingCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
      val staleStaging = fs.listStatus(nsDir).toSeq.filter { st =>
        st.isDirectory && st.getPath.getName.startsWith(".staging_") &&
          st.getModificationTime < stagingCutoff
      }
      staleStaging.foreach(st => fs.delete(st.getPath, true))
      // K51: transaction workspaces abandoned by driver death (or a
      // user who never commits/aborts) are REAL visible tables with a
      // _graft_txn.json marker — same age-gated sweep; only workspaces
      // of THIS table sweep here (the vacuum's scope is one table).
      // Staleness is judged on LAST ACTIVITY — the newest mtime across
      // the begin marker and the workspace's manifest versions (every
      // DML statement publishes one) — not the workspace DIRECTORY
      // mtime: a long-running transaction (a nightly batch that began
      // >24h ago but committed a statement minutes ago) must not be
      // swept while open (advice, round 12).
      val staleTxn = fs.listStatus(nsDir).toSeq.filter { st =>
        st.isDirectory &&
          st.getPath.getName.startsWith(new Path(dir).getName + "__txn_") &&
          fs.exists(new Path(st.getPath, "_graft_txn.json")) && {
            val markerMs = fs.getFileStatus(
              new Path(st.getPath, "_graft_txn.json")).getModificationTime
            val manifestMs =
              try fs.listStatus(new Path(st.getPath, "manifest")).toSeq
                .map(_.getModificationTime).maxOption.getOrElse(-1L)
              catch { case _: java.io.FileNotFoundException => -1L }
            math.max(markerMs, manifestMs) < stagingCutoff
          }
      }
      staleTxn.foreach { st =>
        // a stale workspace of a COMMITTED transaction (its journal
        // exists) is COMPLETED, not discarded as junk: finalize the
        // source's claims first — the journal proves the commit point
        // passed, so sweeping the retry handle must never strand
        // suppressed claims behind it (review pass 2, round 14). The
        // loss of the retry handle itself after the grace window is
        // the retention contract any crash-state GC has; the
        // transaction's EFFECT is durable and visible either way.
        try {
          val mk = readMarker(root, st.getPath.toString)
          if (fs.exists(new Path(journalDir(root), s"committed_${mk.txnId}"))) {
            val mb = new Path(tableDirOf(root, mk.source), "manifest").toString
            ManifestStore.pendingClaims(session, mb, mk.txnId).foreach(v =>
              ManifestStore.finalizePending(session, mb, v, mk.txnId))
          }
        } catch { case _: Exception => () }
        fs.delete(st.getPath, true)
      }
      // K52: pending group-commit claims whose transaction never
      // reached its journal commit point (a driver died between the
      // phases) suppress their version number forever and make CAS
      // writers targeting it fail out — age-gated rollback, same
      // window as the workspace sweep. Committed claims are left for
      // readers to finalize lazily.
      val pendingCrumb = "pending_v(\\d+)_([A-Za-z0-9]+)".r
      val manDir = new Path(manBase)
      if (fs.exists(manDir)) fs.listStatus(manDir).foreach { st =>
        st.getPath.getName match {
          case pendingCrumb(v, txnId) =>
            val vDir = new Path(manDir, s"manifest_v$v")
            val marker = new Path(vDir, s"_pending_$txnId")
            if (fs.exists(marker)) {
              // defensive read: the eager finalizer (or a lazy reader)
              // can delete the marker between the exists and the open —
              // an unreadable marker means "being finalized right now",
              // never a reason to fail the whole VACUUM (review pass 2)
              val jd =
                try {
                  val in = fs.open(marker)
                  try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                  finally in.close()
                } catch { case _: Exception => null }
              if (jd != null) {
                val committed = jd.nonEmpty &&
                  fs.exists(new Path(jd, s"committed_$txnId"))
                if (committed)
                  // committed claims finalize with no age gate — the
                  // journal point makes them durable
                  ManifestStore.finalizePending(session, manBase, v.toLong, txnId)
                else if (fs.exists(marker) &&
                    fs.getFileStatus(vDir).getModificationTime < stagingCutoff)
                  ManifestStore.abortPending(session, manBase, v.toLong, txnId)
              }
            }
          case _ => ()
        }
      }
      // K52 journal sweep (advice, round 14): committed_<txnId> files
      // are retired on commit_txn's happy/retry paths only — lazy
      // reader finalization, or an abort_txn cleaning the workspace of
      // an already-committed transaction, orphans them permanently
      // (unbounded accumulation under repeated crash/abort patterns).
      // Age-gated on the same staging grace: for a journal older than
      // the grace, every group table (the file's CONTENT, written at
      // the commit point) is checked for surviving pending crumbs of
      // the txn — a survivor is FINALIZED first (the journal proves the
      // commit point passed, so finalization needs no age gate) — and
      // the journal then retires. Pre-content journals (empty file)
      // are skipped: without the group list no sweep can prove some
      // other table doesn't still need the journal for lazy
      // finalization; they are bounded by pre-upgrade crash count.
      var retiredJournals = 0L
      val jDir = journalDir(root)
      if (fs.exists(jDir)) fs.listStatus(jDir).foreach { st =>
        val name = st.getPath.getName
        // a journal TEMP file (crash between create and the atomic
        // rename) is pure garbage once past the grace — its txn either
        // retried (and renamed a fresh temp) or aborted (review
        // pass 3, round 14)
        if (name.startsWith(".tmp_") &&
            st.getModificationTime < stagingCutoff) {
          try fs.delete(st.getPath, false) catch { case _: Exception => () }
        }
        if (name.startsWith("committed_") &&
            st.getModificationTime < stagingCutoff) {
          val txnId = name.stripPrefix("committed_")
          val group =
            try {
              val in = fs.open(st.getPath)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } catch { case _: Exception => "" }
          if (group.nonEmpty && txnId.matches("[A-Za-z0-9]+")) {
            // a journal with a SURVIVING workspace is a retryable
            // crashed commit, not a leak: retiring it would send the
            // caller's retry down the pin-verification path with
            // 'source moved — abort and retry', inviting a double
            // apply of DML that is already durably committed (review
            // pass 1, round 14). Claims still finalize (idempotent,
            // journal-proven); only the journal file waits for the
            // workspaces to go.
            val resolvedAll = group.split(',').map(_.trim).filter(_.nonEmpty)
              .forall { t =>
                try {
                  val tDir = tableDirOf(root, t)
                  val gMan = new Path(tDir, "manifest").toString
                  ManifestStore.pendingClaims(session, gMan, txnId).foreach(
                    v => ManifestStore.finalizePending(session, gMan, v, txnId))
                  !fs.exists(new Path(tDir.getParent,
                    s"${tDir.getName}__txn_$txnId"))
                } catch { case _: Exception => false }
              }
            if (resolvedAll) {
              try { fs.delete(st.getPath, false); retiredJournals += 1L }
              catch { case _: Exception => () }
            }
          }
        }
      }
      resultScan(outSchema,
        Seq(swept.length.toLong,
          (doomed.length + staleStaging.length + staleTxn.length +
            retiredJournals).toLong,
          referenced.size.toLong))
    }

    private val outSchema = StructType(Seq(
      StructField("swept_versions", LongType),
      StructField("deleted_files", LongType),
      StructField("live_files", LongType)))
  }
}
