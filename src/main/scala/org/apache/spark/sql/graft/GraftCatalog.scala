package org.apache.spark.sql.graft

import graft.sinks.ManifestStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.analysis._
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{count, input_file_name, lit}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.util

/** DataSource V2 `TableCatalog` over the graft manifest lake — the last
  * rung of the extension ladder: the versioned, atomically-committed
  * table store (K11/K23/K26's machinery) surfaced as a SQL CATALOG, so
  * the reference's `to_sql`-then-query loop (reference:
  * week_1/data_ingest/data_ingest.py:120-178, store_table_in_db +
  * query_data_from_table) runs fully SQL-native:
  *
  * {{{
  *   spark.sql.catalog.graft      = org.apache.spark.sql.graft.GraftCatalog
  *   spark.sql.catalog.graft.root = /lake/root
  *
  *   CREATE NAMESPACE graft.lake
  *   CREATE TABLE graft.lake.t (k STRING, v BIGINT)
  *   INSERT INTO graft.lake.t SELECT ...          -- ONE atomic version
  *   SELECT * FROM graft.lake.t                   -- latest snapshot
  *   SELECT * FROM graft.lake.t VERSION AS OF 1   -- pinned time travel
  * }}}
  *
  * Layout: `<root>/<ns...>/<table>/` holds
  *   - `_graft_table.json` — the table's schema (created exclusively;
  *     existence IS table existence),
  *   - `data_<writer>/part-*.parquet` — immutable data dirs, one per
  *     INSERT (files are never rewritten, only re-listed),
  *   - `manifest/manifest_v<N>/` — [[graft.sinks.ManifestStore]]
  *     versions; each row is (file, n_rows) and version N's file list
  *     IS the table at commit N.
  *
  * Commit semantics: every INSERT publishes exactly one manifest
  * version via [[ManifestStore.tryPublish]] at `basedOn + 1` — an
  * append that loses the version race RE-READS the winner's file list
  * and retries, so concurrent INSERTs serialize with no lost files
  * (same optimistic-concurrency loop as
  * [[graft.sinks.TableStore.mergeCdc]]; raced live in Round20Spec).
  * INSERT OVERWRITE publishes a version listing only the new files —
  * old versions stay committed, which is what makes `VERSION AS OF`
  * free. Readers resolve the manifest ONCE at scan build, so a query
  * plan never sees a moving file list.
  *
  * Read path: the resolved file list is handed to Spark's own
  * [[ParquetTable]], so SELECTs get the stock vectorized parquet scan
  * with filter pushdown, column pruning and AQE — the catalog is a
  * metadata plane only; at 100 TB the per-query cost it adds is one
  * driver-side manifest read (the Delta/Iceberg snapshot-resolution
  * shape). Write path: the V1 write bridge ([[V1Write]]) hands the
  * whole query DataFrame to [[InsertableRelation.insert]], which lands
  * executor-parallel parquet into an immutable data dir and commits
  * metadata-only.
  *
  * Durability notes for object stores without atomic rename: table
  * creation uses create-exclusive (`fs.create(..., overwrite=false)`)
  * and the manifest commit relies on [[ManifestStore]]'s
  * sentinel-verified rename claim — on S3-like stores both map to
  * conditional PUTs (documented CONTRACT, same as K11).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with FunctionCatalog with ProcedureCatalog with StagingTableCatalog {

  /** K41: atomic CTAS/RTAS (see [[GraftStagedTable]]) — the staged
    * table builds invisibly under a dot-prefixed dir and becomes real
    * in one commit; a failed CTAS leaves no table, a failed RTAS
    * leaves the old table untouched.
    */
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replaceExisting = false)

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stage(ident, info, replaceExisting = true)
  }

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replaceExisting = true)

  private def stage(ident: Identifier, info: TableInfo,
                    replaceExisting: Boolean): StagedTable = {
    val (bucketSpec, morKey, morPos) = parseTableInfo(info)
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    if (!replaceExisting && tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    val staging = new Path(nsPath(ident.namespace()),
      s".staging_${java.util.UUID.randomUUID().toString.take(12)}_${safePart(ident.name())}")
    new GraftStagedTable(spark, fs, ident,
      s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      staging, tablePath(ident), info.schema(), bucketSpec, morKey,
      metaText(info.schema(), bucketSpec, morKey, morPos), replaceExisting)
  }

  /** SQL `CALL graft.system.{optimize,vacuum}(...)` — table
    * maintenance on Spark 4's procedure surface (K37, see
    * [[GraftProcedures]]).
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(catalogName, root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  /** The one catalog function: `bucket(n, key)` — what resolves the
    * bucket transform of a K34 storage-partitioned table for Spark's
    * storage-partitioned join (see [[GraftBucketed]]).
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(namespace, "bucket"))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) new GraftBucketUnbound
    else throw new NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  /** K44: the catalog accepts column DEFAULT values (Spark's
    * `SUPPORT_COLUMN_DEFAULT_VALUE` rung) — `CREATE TABLE (... c INT
    * DEFAULT 5)` and `ALTER TABLE ADD COLUMN ... DEFAULT <literal>`.
    * Defaults ride the schema JSON as field metadata (Spark's
    * CURRENT_DEFAULT / EXISTS_DEFAULT pair): INSERTs that omit the
    * column materialize the CURRENT default at analysis; files
    * committed BEFORE the column existed project the EXISTENCE
    * default at read (the parquet readers' existence-default fill) —
    * a metadata-only commit, no file rewrite, the Delta/Iceberg ADD
    * COLUMN DEFAULT shape. Non-literal defaults never reach the
    * catalog: Spark requires constant-foldable DEFAULT expressions.
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Path-safe identifier parts only — a namespace or table name that
    * could escape `root` (separators, traversal) is rejected at the
    * catalog boundary, not discovered as filesystem damage later.
    */
  private def safePart(part: String): String = {
    require(part.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*") && !part.contains(".."),
      s"identifier part '$part' is not path-safe ([A-Za-z0-9_.-], no '..')")
    part
  }

  private def nsPath(namespace: Array[String]): Path =
    GraftCatalog.layoutDir(root, namespace.toSeq.map(safePart))
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), safePart(ident.name()))
  private def metaFile(dir: Path): Path = new Path(dir, "_graft_table.json")
  private val NamespaceMarker = "_graft_namespace"

  /** Meta-file content: schema + (optional) bucket spec in ONE file,
    * so the create-exclusive write that IS table existence also
    * carries the bucketing atomically — a failed duplicate CREATE can
    * never corrupt a live table's bucket metadata the way a separate
    * spec file written before the uniqueness check could (review
    * finding, round 10). Unbucketed tables keep the legacy
    * schema-JSON-only form.
    */
  private def metaText(schema: StructType, bucketSpec: Option[(String, Int)],
                       morKey: Option[String] = None,
                       morPos: Boolean = false): String =
    (bucketSpec, morKey, morPos) match {
      case (Some((col, n)), _, _) =>
        GraftTableMeta.requireSafeMetaName("bucket column", col)
        s"""{"graftBucket":{"col":"$col","n":$n},"schema":${schema.json}}"""
      case (None, Some(key), _) =>
        GraftTableMeta.requireSafeMetaName("merge key", key)
        s"""{"graftMor":{"key":"$key"},"schema":${schema.json}}"""
      case (None, None, true) =>
        s"""{"graftMorPos":true,"schema":${schema.json}}"""
      case _ => schema.json
    }

  // ---- namespaces -------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      fs.exists(new Path(nsPath(namespace), NamespaceMarker))

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    val dir = nsPath(namespace)
    fs.mkdirs(dir)
    fs.create(new Path(dir, NamespaceMarker), true).close()
  }

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, NamespaceMarker)))
      .map(st => namespace :+ st.getPath.getName)
      .sortBy(_.mkString("."))
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"catalog '$catalogName' does not support ALTER NAMESPACE")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    // non-cascade must refuse on CHILD NAMESPACES too, not just direct
    // tables — the recursive delete below would otherwise silently
    // destroy nested namespaces' tables (review finding, round 9)
    if (!cascade &&
        (listTables(namespace).nonEmpty || listNamespaces(namespace).nonEmpty))
      throw new NonEmptyNamespaceException(namespace)
    fs.delete(nsPath(namespace), true)
  }

  // ---- tables -----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).toSeq
      // dot-prefixed dirs are in-flight CTAS/RTAS stagings (K41) —
      // complete tables on disk, invisible until their commit rename
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        fs.exists(metaFile(st.getPath)))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .sortBy(_.name())
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(metaFile(tablePath(ident)))

  override def loadTable(ident: Identifier): Table = {
    // K40: Iceberg-style METADATA TABLES — `SELECT * FROM cat.ns.t.history`
    // parses as namespace [ns, t] + name "history"; when no real table
    // claims that identifier and the prefix IS a table, serve its
    // metadata (versions, file lists) as a queryable relation. A real
    // table named "history" under a namespace always wins — metadata
    // resolution only fills identifiers that would otherwise fail.
    if (!tableExists(ident) && ident.namespace().nonEmpty &&
        GraftMetaTable.kinds.contains(ident.name().toLowerCase)) {
      val baseIdent = Identifier.of(
        ident.namespace().dropRight(1), ident.namespace().last)
      if (tableExists(baseIdent))
        return new GraftMetaTable(ident.name().toLowerCase,
          tablePath(baseIdent).toString,
          s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}")
    }
    loadPinned(ident, None)
  }

  /** `VERSION AS OF <v>` — a pinned snapshot read through the catalog
    * (the same metadata-plane resolution as K24's `graft_table` TVF,
    * now on the standard SQL surface). K55: a NON-integer version
    * string is a REF NAME — a branch or tag from the table's ref
    * store (`<tableDir>/refs`, K38's RefStore attached to catalog
    * tables via `CALL graft.system.set_ref`), so the write-audit-
    * publish branch workflow is queryable in plain SQL:
    * `SELECT ... FROM t VERSION AS OF 'audit'`.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    def refResolved(baseIdent: Identifier): Long = {
      val dir = tablePath(baseIdent)
      if (!fs.exists(metaFile(dir))) throw new NoSuchTableException(baseIdent)
      try graft.sinks.RefStore.resolve(spark,
        new Path(dir, "refs").toString, version)._2
      catch { case e: java.util.NoSuchElementException =>
        throw new IllegalArgumentException(
          s"table ${baseIdent.name()}: VERSION AS OF '$version' is neither " +
            "an integer commit version nor a known branch/tag (create refs " +
            s"with CALL $catalogName.system.set_ref): ${e.getMessage}")
      }
    }
    val v = version.toLongOption.getOrElse {
      // metadata suffixes resolve the ref against the BASE table
      val baseIdent =
        if (!tableExists(ident) && ident.namespace().nonEmpty &&
            GraftMetaTable.kinds.contains(ident.name().toLowerCase))
          Identifier.of(ident.namespace().dropRight(1), ident.namespace().last)
        else ident
      refResolved(baseIdent)
    }
    // K43: metadata relations resolve AT a version too —
    // `t.files VERSION AS OF 3` is the file list a reader pinned at v3
    // sees, `t.history` truncates to commits ≤ v3 (same
    // suffix-resolution rule as the unpinned path: a real table named
    // like a metadata kind always wins)
    if (!tableExists(ident) && ident.namespace().nonEmpty &&
        GraftMetaTable.kinds.contains(ident.name().toLowerCase)) {
      val baseIdent = Identifier.of(
        ident.namespace().dropRight(1), ident.namespace().last)
      if (tableExists(baseIdent))
        return new GraftMetaTable(ident.name().toLowerCase,
          tablePath(baseIdent).toString,
          s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
          Some(v))
    }
    loadPinned(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <t>` — resolve to the LATEST version committed
    * at or before `t` (Spark hands micros since epoch; commit instants
    * come from [[ManifestStore.versionsWithTimes]] — the version dir's
    * mtime, which the winning publisher NORMALIZES to be strictly
    * after its predecessor's at claim time, Delta's in-commit-
    * timestamp pattern, so resolution is monotone in version order
    * even on coarse-mtime stores). A pin before the first commit
    * fails loudly with the available range (K36).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    // K43: metadata relations time-travel too — `t.files TIMESTAMP AS
    // OF t` resolves the pin against the BASE table's commit instants
    // (same suffix rule as the other two loadTable overloads; review
    // finding, round 11: VERSION AS OF resolved here but TIMESTAMP AS
    // OF fell through to NoSuchTableException)
    if (!tableExists(ident) && ident.namespace().nonEmpty &&
        GraftMetaTable.kinds.contains(ident.name().toLowerCase)) {
      val baseIdent = Identifier.of(
        ident.namespace().dropRight(1), ident.namespace().last)
      if (tableExists(baseIdent))
        return new GraftMetaTable(ident.name().toLowerCase,
          tablePath(baseIdent).toString,
          s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
          Some(resolveAtTimestamp(baseIdent, timestampMicros)))
    }
    loadPinned(ident, Some(resolveAtTimestamp(ident, timestampMicros)))
  }

  /** LATEST version committed at or before the instant (see the
    * in-commit-timestamp notes on the caller).
    */
  private def resolveAtTimestamp(ident: Identifier, timestampMicros: Long): Long = {
    val dir = tablePath(ident)
    if (!fs.exists(metaFile(dir))) throw new NoSuchTableException(ident)
    val times = ManifestStore.versionsWithTimes(spark, new Path(dir, "manifest").toString)
    val tMillis = Math.floorDiv(timestampMicros, 1000L)
    val eligible = times.filter(_._2 <= tMillis)
    if (eligible.isEmpty)
      throw new IllegalArgumentException(
        s"table ${ident.name()}: no version committed at or before " +
          s"epoch-millis $tMillis (first commit: ${times.headOption.fold("none")(_._2.toString)})")
    eligible.map(_._1).max
  }

  private def loadPinned(ident: Identifier, version: Option[Long]): Table = {
    val dir = tablePath(ident)
    val meta = metaFile(dir)
    if (!fs.exists(meta)) throw new NoSuchTableException(ident)
    val in = fs.open(meta)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val m = GraftTableMeta.parseFull(meta.toString, txt)
    new GraftLakeTable(s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      dir.toString, m.schema, version, m.bucket, m.morKey, m.morPos,
      bucketSpecId = m.currentSpecId)
  }

  /** The ONE supported partition transform (bucket(n, bigintCol) —
    * K34) and the K39 merge-on-read property, shared by CREATE TABLE
    * and the staged CTAS/RTAS path.
    */
  private def parseTableInfo(info: TableInfo)
      : (Option[(String, Int)], Option[String], Boolean) = {
    // the ONE supported partition transform: bucket(n, bigintCol) —
    // K34 storage-partitioned tables. Anything else is refused loudly
    val bucketSpec: Option[(String, Int)] = info.partitions().toSeq match {
      case Seq() => None
      case Seq(t) =>
        (t.name(), t.arguments().toSeq) match {
          case ("bucket", Seq(
              n: org.apache.spark.sql.connector.expressions.Literal[_],
              f: org.apache.spark.sql.connector.expressions.NamedReference))
              if n.dataType() == org.apache.spark.sql.types.IntegerType &&
                f.fieldNames().length == 1 =>
            val col = f.fieldNames()(0)
            val field = info.schema().fields.find(_.name == col).getOrElse(
              throw new IllegalArgumentException(
                s"bucket column '$col' is not in the table schema"))
            require(field.dataType == org.apache.spark.sql.types.LongType,
              s"bucket column '$col' must be BIGINT (got ${field.dataType.simpleString})")
            Some((col, n.value().asInstanceOf[Int]))
          case _ => throw new UnsupportedOperationException(
            s"catalog '$catalogName' supports only PARTITIONED BY " +
              s"(bucket(n, bigintCol)), got ${t.describe()}")
        }
      case _ => throw new UnsupportedOperationException(
        s"catalog '$catalogName' supports at most one bucket transform")
    }
    // K39: TBLPROPERTIES('graft.merge-on-read.key'='<bigintCol>') opts
    // the table into merge-on-read row-level writes (SupportsDelta):
    // DELETE/UPDATE/MERGE land equality-delete files keyed by this
    // column instead of rewriting data files. The key column must be
    // BIGINT (the delete files hold longs) and MoR composes with flat
    // tables only (a bucketed MoR table would need bucket-routed
    // delete files — refused, not half-supported).
    val morKey: Option[String] =
      Option(info.properties().get("graft.merge-on-read.key")).map { key =>
        require(bucketSpec.isEmpty,
          "merge-on-read and bucketing cannot combine on one table")
        val field = info.schema().fields.find(_.name == key).getOrElse(
          throw new IllegalArgumentException(
            s"merge-on-read key '$key' is not in the table schema"))
        require(field.dataType == org.apache.spark.sql.types.LongType,
          s"merge-on-read key '$key' must be BIGINT (got ${field.dataType.simpleString})")
        // Spark's delta rewrite refuses nullable row ids outright
        // (NULLABLE_ROW_ID_ATTRIBUTES) — surface the requirement at
        // CREATE, where the fix (add NOT NULL) is obvious
        require(!field.nullable,
          s"merge-on-read key '$key' must be declared NOT NULL " +
            "(row ids cannot be nullable)")
        key
      }
    // K42: TBLPROPERTIES('graft.merge-on-read.mode'='position') opts
    // the table into POSITIONAL merge-on-read ([[GraftPosDeltaOperation]]):
    // DML records (file, row_index) delete vectors and masked reads
    // keep the vectorized parquet path. No key column needed — the row
    // id is the (_file, _pos) metadata-column pair, so the two modes
    // are exclusive, and the metadata names must be free in the schema.
    val morPos: Boolean =
      Option(info.properties().get("graft.merge-on-read.mode")) match {
        case None => false
        case Some("position") =>
          require(morKey.isEmpty,
            "merge-on-read.mode='position' uses the (_file, _pos) row id — " +
              "drop the 'graft.merge-on-read.key' property")
          require(bucketSpec.isEmpty,
            "merge-on-read and bucketing cannot combine on one table")
          require(!info.schema().fieldNames.exists(n =>
              n == GraftPosMeta.FileCol || n == GraftPosMeta.PosCol),
            s"positional merge-on-read reserves the metadata column names " +
              s"'${GraftPosMeta.FileCol}' and '${GraftPosMeta.PosCol}'")
          true
        case Some(other) => throw new IllegalArgumentException(
          s"graft.merge-on-read.mode '$other' is not supported " +
            "(only 'position'; equality mode is keyed by " +
            "'graft.merge-on-read.key')")
      }
    (bucketSpec, morKey, morPos)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val (bucketSpec, morKey, morPos) = parseTableInfo(info)
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    // create-exclusive: existence of the meta file IS table existence,
    // so the failing create is the CREATE TABLE uniqueness check; the
    // bucket spec rides the same single write, so a losing CREATE
    // cannot touch the winner's metadata
    val out =
      try fs.create(metaFile(dir), false)
      catch { case _: java.io.IOException =>
        throw new TableAlreadyExistsException(ident)
      }
    // an in-process write failure must not wedge the identifier: drop
    // the claimed meta file before rethrowing (a kill -9 mid-write can
    // still leave a truncated file — loadTable names the remedy)
    try { out.write(metaText(info.schema(), bucketSpec, morKey, morPos).getBytes("UTF-8")); out.close() }
    catch { case e: Throwable =>
      try { out.close() } catch { case _: Throwable => () }
      fs.delete(metaFile(dir), false)
      throw e
    }
    new GraftLakeTable(s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      dir.toString, info.schema(), None, bucketSpec, morKey, morPos)
  }

  @deprecated("use createTable(Identifier, TableInfo)", "kept for the interface")
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident, new TableInfo.Builder()
      .withColumns(CatalogV2Util.structTypeToV2Columns(schema))
      .withPartitions(partitions)
      .withProperties(properties)
      .build())

  /** ALTER TABLE — the SAFE evolution subset for immutable parquet
    * files: ADD COLUMN, top-level, no position; nullable, OR carrying
    * a literal DEFAULT (K44 — the default then backs rows in files
    * committed before the column existed, so even a non-nullable add
    * is total). Existing files simply lack the column and the parquet
    * reader fills the EXISTENCE default (null when none — K19's
    * read-side contract); later INSERTs materialize the CURRENT
    * default. Everything else (drop/rename/retype) would change how
    * EXISTING files resolve by name and is refused — that's K27's
    * metadata-commit + REORG territory, not a meta-file edit.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tablePath(ident)
    if (!fs.exists(metaFile(dir))) throw new NoSuchTableException(ident)
    // a transaction WORKSPACE must refuse schema edits (review pass 3,
    // round 14): commit_txn pins only the SOURCE meta, so a
    // workspace-local ALTER would pass the pin while its added
    // columns' data silently project away under the source schema —
    // the user's schema change would be lost without a word. ALTER the
    // source (open transactions then abort at commit via the metaSha
    // pin), or commit first.
    if (fs.exists(new Path(dir, "_graft_txn.json")))
      throw new UnsupportedOperationException(
        s"ALTER TABLE on transaction workspace ${ident.name()} is refused " +
          "— alter the source table instead (open transactions then abort " +
          "at commit through the meta pin), or commit the transaction first")
    val supported = changes.forall {
      case a: TableChange.AddColumn =>
        a.fieldNames().length == 1 && a.position() == null &&
          (a.isNullable || a.defaultValue() != null)
      // K47: ALTER COLUMN ... SET/DROP DEFAULT — a CURRENT-default-only
      // edit (the EXISTENCE default stays what it was when the column
      // appeared, so rows in old files keep reading their original
      // backfill value — the drift the CURRENT/EXISTS pair exists for).
      // Metadata-only by construction: no file resolves differently.
      case u: TableChange.UpdateColumnDefaultValue =>
        u.fieldNames().length == 1
      case _ => false
    }
    if (!supported)
      throw new UnsupportedOperationException(
        s"catalog '$catalogName' supports only ALTER TABLE ADD COLUMN " +
          "(top-level, nullable or with a literal DEFAULT) and ALTER " +
          "COLUMN ... SET/DROP DEFAULT — other changes would re-map " +
          "existing immutable files")
    // the whole read-modify-rename swap runs under the JVM meta-swap
    // lock: a concurrent set_bucketing (the OTHER meta editor) reading
    // a stale meta would otherwise overwrite this ALTER's schema — or
    // this ALTER would erase its spec history (review finding, r12)
    GraftTableMeta.withMetaSwapLock(metaFile(dir).toString) {
    val currentTable = loadPinned(ident, None).asInstanceOf[GraftLakeTable]
    // the provider gates Spark's DEFAULT-value support check, and
    // applySchemaChanges also constant-folds CURRENT defaults into the
    // EXISTS defaults old files project (K44)
    val applied = CatalogV2Util.applySchemaChanges(
      currentTable.schema(), changes.toSeq, Some("parquet"), "ALTER TABLE")
    // applySchemaChanges' AddColumn path RE-FOLDS every field's CURRENT
    // default into its EXISTS default — which would silently corrupt
    // K47's drift (an ADD COLUMN after SET DEFAULT 'new' would flip
    // pre-ADD rows from 'old' to 'new'). An existence default is set
    // exactly ONCE, when its column appears: restore pre-existing
    // fields' EXISTS metadata verbatim (review finding, round 11).
    val existsKey = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .EXISTS_DEFAULT_COLUMN_METADATA_KEY
    val prior = currentTable.schema().fields.map(f => f.name -> f).toMap
    val evolved = StructType(applied.fields.map { f =>
      prior.get(f.name) match {
        case Some(old) =>
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
          val restored =
            if (old.metadata.contains(existsKey))
              mb.putString(existsKey, old.metadata.getString(existsKey)).build()
            else { mb.remove(existsKey); mb.build() }
          f.copy(metadata = restored)
        case None => f
      }
    })
    // temp-write + OVERWRITE-rename (FileContext — FileSystem.rename
    // refuses file-onto-file): atomic on POSIX, a conditional PUT on
    // object stores, so readers see the old or the new schema, never
    // a truncated meta file; the bucket spec rides along unchanged —
    // including the K50 spec HISTORY (an ADD COLUMN on an evolved
    // table must not refold the meta into the single-spec legacy form,
    // which would relabel every old file as current-spec)
    val fullMeta = GraftTableMeta.readFull(fs, metaFile(dir))
    val newMetaTxt =
      if (fullMeta.bucketSpecs.length > 1 || fullMeta.currentSpecId != 0L)
        GraftTableMeta.evoText(evolved, fullMeta.bucketSpecs, fullMeta.currentSpecId)
      else metaText(evolved, currentTable.bucket, currentTable.morKeyCol,
        currentTable.morPositional)
    val tmp = new Path(dir, s".meta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(newMetaTxt.getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(metaFile(dir).toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, metaFile(dir), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    new GraftLakeTable(
      s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      dir.toString, evolved, None, currentTable.bucket, currentTable.morKeyCol,
      currentTable.morPositional, bucketSpecId = fullMeta.currentSpecId)
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!fs.exists(metaFile(dir))) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace()))
      throw new NoSuchNamespaceException(newIdent.namespace())
    // manifests store paths RELATIVE to the table dir, so rename is
    // ONE atomic directory move — no manifest rewrite, no window where
    // the version history exists in neither place (the round-9 review
    // killed a rewrite-based variant exactly for that window)
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }
}

object GraftCatalog {
  /** The catalog's directory-layout convention — `<root>/<ns...>/<table>`
    * — in ONE place: the catalog's own `nsPath`/`tablePath` and every
    * out-of-catalog resolver (the graft-cdf stream provider) derive
    * table directories through here, so a layout change cannot
    * silently desynchronize a stream's manifest location from the
    * catalog's (ADVICE finding, round 11).
    */
  private[graft] def layoutDir(root: String, parts: Seq[String]): Path =
    parts.foldLeft(new Path(root))((p, n) => new Path(p, n))
}

/** One manifest-lake table: reads delegate to Spark's parquet DSv2 over
  * the pinned version's file list; writes land an immutable data dir
  * and commit one manifest version (see [[GraftCatalog]]).
  */
private[graft] class GraftLakeTable(tableName: String, dir: String,
                                    tableSchema: StructType,
                                    pinnedVersion: Option[Long],
                                    bucketSpec: Option[(String, Int)] = None,
                                    morKey: Option[String] = None,
                                    morPos: Boolean = false,
                                    bucketSpecId: Long = 0L)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  private[graft] def bucket: Option[(String, Int)] = bucketSpec
  private[graft] def morKeyCol: Option[String] = morKey
  private[graft] def morPositional: Boolean = morPos
  private[graft] def specId: Long = bucketSpecId

  /** K42: positional-MoR tables expose the `_file`/`_pos` metadata
    * columns — the DML row id, and user-queryable like Iceberg's
    * reserved pair. Other table modes expose none.
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (morPos) GraftPosMeta.columns
    else Array.empty

  override def partitioning(): Array[Transform] =
    bucketSpec.map { case (col, n) =>
      GraftLakeTable.bucketTransform(n, col)
    }.toArray

  /** SQL MERGE INTO / UPDATE — K32/K33's group-based copy-on-write
    * rewrite (see [[GraftRowLevelOperation]]): the operation's scan
    * reads the touched files (runtime group filtering prunes via the
    * manifest's per-file min/max stats), the write lands the rewritten
    * groups in a fresh immutable data dir, and ONE manifest version
    * commits rewritten + carried-by-reference untouched files. DELETE
    * keeps its K30 metadata path (`SupportsDelete`) when the predicate
    * translates; otherwise it flows through the same group rewrite.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    morKey match {
      // K39: merge-on-read tables take the DELTA path (SupportsDelta):
      // DML lands equality-delete files + new data files, never
      // rewriting a committed data file (see [[GraftDeltaOperation]])
      case Some(key) =>
        () => new GraftDeltaOperation(info.command(), dir, tableSchema, key)
      // K42: positional MoR — the delta row id is the (_file, _pos)
      // metadata pair; DML lands position-delete files (see
      // [[GraftPosDeltaOperation]])
      case None if morPos =>
        () => new GraftPosDeltaOperation(info.command(), dir, tableSchema)
      case None =>
        () => new GraftRowLevelOperation(info.command(), dir, tableSchema,
          bucketSpec, bucketSpecId)
    }

  private def spark: SparkSession = SparkSession.active
  private def manBase: String = s"$dir/manifest"

  override def name(): String = tableName
  override def schema(): StructType = tableSchema

  /** The storage IS parquet — and naming it is what passes Spark's
    * default-column provider gate (`spark.sql.defaultColumn
    * .allowedProviders`) for K44's ALTER ... DEFAULT surface.
    */
  override def properties(): util.Map[String, String] =
    util.Collections.singletonMap(TableCatalog.PROP_PROVIDER, "parquet")
  override def capabilities(): util.Set[TableCapability] =
    // MICRO_BATCH_READ only where the scan actually delivers it (the
    // flat path's K42 wrapper) — advertising it on bucketed/MoR
    // tables would pass the analyzer's capability check and then
    // crash at stream start on Scan's default toMicroBatchStream
    if (bucketSpec.isEmpty && morKey.isEmpty && !morPos)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
    else if (bucketSpec.isDefined)
      // K46: bucketed INSERTs take the REAL V2 write (the
      // RequiresDistributionAndOrdering + single-pass-router path)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    else
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** The pinned (or latest) committed file list — resolved ONCE per
    * scan build, so one query never sees two snapshots. An empty table
    * (no committed version yet) is a valid zero-file scan.
    */
  private def currentManifestRows(): Seq[GraftLakeTable.ManifestRow] = {
    val committed = ManifestStore.versions(spark, manBase)
    val v = pinnedVersion match {
      case Some(p) =>
        if (!committed.contains(p)) throw new java.util.NoSuchElementException(
          s"$tableName: version $p is not committed (available: ${committed.mkString(", ")})")
        Some(p)
      case None => committed.lastOption
    }
    v match {
      case None => Seq.empty
      case Some(ver) =>
        // manifest rows are table-dir-relative (what makes RENAME one
        // atomic move); callers resolve against the CURRENT location
        GraftLakeTable.manifestRowsFull(spark, manBase, ver).sortBy(_.file)
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    bucketSpec match {
      case Some((col, n)) =>
        val rows = currentManifestRows()
        // K50: key-grouped partitioning is claimable ONLY when every
        // live file was written under the CURRENT bucket spec — after
        // a partition-transform evolution, old-spec files keep their
        // old routing, so the mixed snapshot reads through the flat
        // stat-pruned scan (correct, no SPJ) until a rewrite
        // (OPTIMIZE) converges the layout. Iceberg's exact contract.
        if (rows.forall(_.spec == bucketSpecId))
          new GraftBucketedScanBuilder(spark, tableName, dir,
            rows, tableSchema, col, n, options)
        else
          new GraftPrunedScanBuilder(spark, tableName, dir, rows,
            tableSchema, options)
      case None if morKey.isDefined =>
        // K39: merge-on-read read path — equality-delete files mask
        // their keys out of OLDER data files at read time (see
        // [[GraftMorScanBuilder]]); a delete-free snapshot degrades to
        // the stock pruned scan
        GraftDeltaOperation.morScanBuilder(spark, tableName, dir,
          currentManifestRows(), tableSchema, morKey.get, options)
      case None if morPos =>
        // K42: positional-MoR read path — delete positions mask rows
        // out of exactly the files that recorded them, on the
        // VECTORIZED path (see [[GraftPosScanBuilder]]); delete-free
        // snapshots degrade to the stock pruned scan
        GraftPosMeta.scanBuilder(spark, tableName, dir,
          currentManifestRows(), tableSchema, options)
      case None =>
        // K35: manifest-stats file pruning wraps the stock parquet
        // builder — SELECTs skip provably-non-matching files; the
        // K42 wrapper adds the version-offset streaming source
        // (`readStream.table`) on top of the untouched batch path
        new GraftLakeScanBuilder(
          new GraftPrunedScanBuilder(spark, tableName, dir,
            currentManifestRows(), tableSchema, options),
          dir, tableSchema, options)
    }

  /** `DELETE FROM` — K14's targeted erasure on the SQL surface: read
    * the current snapshot, keep the survivors (DELETE's null
    * semantics: a NULL-evaluating predicate does NOT delete), land
    * them in a fresh immutable data dir and publish ONE new version
    * listing only the survivor files. Old versions stay committed —
    * pre-delete snapshots remain readable via `VERSION AS OF` until
    * K18's VACUUM retention sweeps them (a GDPR erasure therefore
    * pairs DELETE with a retention sweep, the Delta/Iceberg contract).
    * This rewrite is FULL-table because the catalog's manifest carries
    * (file, n_rows) only; with K14's min/max sidecar the plan prunes
    * to intersecting files — same commit protocol, fewer rewrites.
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    // a merge-on-read table (either mode) refuses the copy-on-write
    // metadata DELETE so the statement flows through the DELTA rewrite
    // (delete files, no data-file rewrite — the whole point of the mode)
    morKey.isEmpty && !morPos &&
      filters.forall(f => GraftLakeTable.filterToColumn(f).isDefined)

  /** DELETE with K14's min/max refinement, now real (the manifest
    * carries per-file stats): only files that MAY hold a matching row
    * are read and rewritten; provably-clean files carry BY REFERENCE
    * through [[GraftLakeTable.commitReplace]] — which also means a
    * racing INSERT's files survive a concurrent DELETE (the old
    * full-overwrite commit dropped them).
    */
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val session = spark
    val doomed = filters.flatMap(GraftLakeTable.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val rows = currentManifestRows()
    val (touched, _) = rows.partition(r =>
      filters.forall(f => GraftGroupScan.mayMatch(tableSchema, r.stats, f)))
    // K56: METADATA-ONLY deletes — a touched file whose stats + K53
    // null counts PROVE every row matches the predicate is dropped
    // from the manifest without being read (the Delta/Iceberg
    // partition-delete fast path: `DELETE WHERE day < X` at 100 TB is
    // O(metadata) for the files wholly inside the range, and only the
    // boundary files pay the rewrite). An empty filter set (TRUNCATE
    // shape) proves nothing here — AlwaysTrue arrives as a filter when
    // Spark means it.
    val (dropped, rewrite) = touched.partition(r =>
      filters.nonEmpty && filters.forall(f =>
        GraftGroupScan.mustMatchAll(tableSchema, r.stats, r.nRows, f)))
    val writerId = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$dir/data_$writerId"
    if (rewrite.nonEmpty) {
      val current = session.read.schema(tableSchema)
        .parquet(rewrite.map(r => GraftLakeTable.resolveFile(dir, r.file)): _*)
      val survivors = current.where(
        !org.apache.spark.sql.functions.coalesce(doomed, org.apache.spark.sql.functions.lit(false)))
      GraftLakeTable.writeData(dataDir, survivors, bucketSpec)
    }
    // a DELETE matching nothing still commits one (identical) version —
    // the statement happened, the history says so; dropped files are
    // simply absent from the new version (their bytes stay on disk for
    // time travel until VACUUM, like every replaced file)
    GraftLakeTable.commitReplace(session, dir, dataDir,
      (dropped ++ rewrite).map(_.file).toSet, tableSchema, bucketSpec.isDefined,
      s"DELETE on $tableName", specId = bucketSpecId)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    bucketSpec match {
      // K46: bucketed INSERT/OVERWRITE as a REAL V2 write that asks
      // Spark to CLUSTER incoming rows by the bucket transform
      // (RequiresDistributionAndOrdering, resolved through the
      // catalog's own `bucket` function — the Iceberg
      // write-distribution contract): each bucket lands in exactly ONE
      // task, so the single-pass router writes ONE file per bucket per
      // INSERT regardless of the source's partitioning — where the V1
      // path's directory-partitioned write fanned out up to
      // tasks × buckets files and leaned on callers' REPARTITION
      // hints. Same manifest-gated commit as the row-level router.
      case Some((col, n)) =>
        new WriteBuilder with SupportsTruncate {
          private var overwrite = false
          override def truncate(): WriteBuilder = { overwrite = true; this }
          override def build(): Write =
            new GraftBucketedInsertWrite(dir, info, col, n, overwrite,
              bucketSpecId)
        }
      case None =>
        new WriteBuilder with SupportsTruncate {
          private var overwrite = false
          override def truncate(): WriteBuilder = { overwrite = true; this }
          override def build(): Write = new V1Write {
            override def toInsertableRelation: InsertableRelation =
              new InsertableRelation {
                override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
                  GraftLakeTable.insert(data.sparkSession, dir, data,
                    overwrite || overwriteFlag, bucketSpec = bucketSpec,
                    specId = bucketSpecId)
              }
          }
        }
    }
}

/** K46: the bucketed-table INSERT write — see
  * [[GraftLakeTable.newWriteBuilder]]. Distribution-clustered,
  * single-pass-routed, append-committed through the shared optimistic
  * loop (appends commute; OVERWRITE publishes the new files alone).
  */
private[graft] class GraftBucketedInsertWrite(
    dir: String,
    info: LogicalWriteInfo,
    bucketCol: String,
    nBuckets: Int,
    overwrite: Boolean,
    specId: Long = 0L)
  extends Write
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  private def spark: SparkSession = SparkSession.active
  private val writerId = java.util.UUID.randomUUID().toString.take(12)
  private val dataDir = s"$dir/data_$writerId"

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(GraftLakeTable.bucketTransform(nBuckets, bucketCol)))

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = Array.empty

  override def requiredNumPartitions(): Int = 0

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    GraftBucketRoutedBatchWrite.batchWrite(
      spark, dataDir, info.schema(), bucketCol, nBuckets) { files =>
      GraftLakeTable.commitAppend(spark, dir, dataDir, info.schema(),
        overwrite, spark.conf.getOption(GraftLakeTable.TxnConfKey).getOrElse(""),
        bucketed = true, onlyFiles = Some(files), specId = specId)
    }

  override def description(): String = s"GraftBucketedInsertWrite($dataDir)"
}

/** The ONE parser for `_graft_table.json` wrappers — the catalog and
  * the CALL procedures both resolve meta through here, so a new
  * wrapper variant cannot drift between them (round-10 review: the
  * procedures' hand-copied regex missed the MoR wrapper and crashed
  * OPTIMIZE on MoR tables).
  */
private[graft] object GraftTableMeta {
  private val WrappedBucket =
    """(?s)\{"graftBucket":\{"col":"([^"]+)","n":(\d+)\},"schema":(.*)\}""".r
  private val WrappedMor =
    """(?s)\{"graftMor":\{"key":"([^"]+)"\},"schema":(.*)\}""".r
  private val WrappedMorPos =
    """(?s)\{"graftMorPos":true,"schema":(.*)\}""".r
  // K50: the evolved-bucketing wrapper — the FULL spec history plus
  // the current id, so old files' routing stays interpretable forever.
  // Spec encoding: [id,"col",n] (bucketed) or [id,null,0] (flat).
  private val WrappedBucketEvo =
    """(?s)\{"graftBucketEvo":\{"current":(\d+),"specs":\[(.*?)\]\},"schema":(.*)\}""".r
  private val SpecItem = """\[(\d+),(?:"([^"]+)"|null),(\d+)\]""".r

  /** The full table metadata: mode flags plus (K50) the bucket-spec
    * history. Legacy wrappers parse as a single spec with id 0.
    */
  case class TableMeta(schema: StructType, bucket: Option[(String, Int)],
                       morKey: Option[String], morPos: Boolean,
                       bucketSpecs: Seq[(Long, Option[(String, Int)])],
                       currentSpecId: Long)

  def parseFull(metaPath: String, txt: String): TableMeta = {
    val (schemaJson, spec, morKey, morPos, specs, currentId) = txt.trim match {
      case WrappedBucketEvo(cur, items, rest) =>
        val parsed = SpecItem.findAllMatchIn(items).map { m =>
          val id = m.group(1).toLong
          val specOpt =
            if (m.group(2) == null) None
            else Some((m.group(2), m.group(3).toInt))
          (id, specOpt)
        }.toSeq
        require(parsed.nonEmpty, s"table metadata at $metaPath: empty spec list")
        val curId = cur.toLong
        val current = parsed.find(_._1 == curId).getOrElse(
          throw new IllegalStateException(
            s"table metadata at $metaPath: current spec $curId not in " +
              s"the spec list ${parsed.map(_._1).mkString(", ")}")
        )._2
        (rest, current, None, false, parsed, curId)
      case WrappedBucket(col, n, rest) =>
        val s = Some((col, n.toInt))
        (rest, s, None, false, Seq((0L, s)), 0L)
      case WrappedMor(key, rest) =>
        (rest, None, Some(key), false, Seq((0L, None)), 0L)
      case WrappedMorPos(rest) =>
        (rest, None, None, true, Seq((0L, None)), 0L)
      case other =>
        (other, None, None, false, Seq((0L, None)), 0L)
    }
    // a truncated meta file (disk-full/kill during CREATE) must fail
    // with a NAMED remedy, not a raw JSON parse error wedging the
    // identifier opaquely
    val schema =
      try DataType.fromJson(schemaJson).asInstanceOf[StructType]
      catch { case e: Exception =>
        throw new IllegalStateException(
          s"table metadata at $metaPath is unreadable (interrupted CREATE " +
            s"TABLE?) — drop the table directory to recover", e)
      }
    TableMeta(schema, spec, morKey, morPos, specs, currentId)
  }

  def parse(metaPath: String, txt: String)
      : (StructType, Option[(String, Int)], Option[String], Boolean) = {
    val m = parseFull(metaPath, txt)
    (m.schema, m.bucket, m.morKey, m.morPos)
  }

  /** Open + read + [[parseFull]] in one place — the ONE meta reader
    * (the catalog, the procedures and the CDF key pin all resolve
    * through here, so encoding/error handling cannot drift; review
    * pass 2, round 12).
    */
  def readFull(fs: org.apache.hadoop.fs.FileSystem, metaPath: Path)
      : TableMeta = {
    val in = fs.open(metaPath)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseFull(metaPath.toString, txt)
  }

  /** Serializes read-modify-rename swaps of ONE meta file within this
    * JVM (ALTER TABLE and `set_bucketing` both edit `_graft_table.json`
    * — un-serialized, the loser's stale read would silently drop the
    * winner's schema change or spec history; review finding, round 12).
    * Cross-DRIVER meta edits keep the documented object-store CONTRACT
    * the rest of the meta plane states: the OVERWRITE rename maps to a
    * conditional PUT (ETag/if-match), so a concurrent remote editor
    * fails its swap instead of losing the local one.
    */
  private val swapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withMetaSwapLock[T](metaPath: String)(body: => T): T =
    swapLocks.computeIfAbsent(metaPath, _ => new Object).synchronized(body)

  /** Column/key names that get interpolated RAW into the meta-file
    * JSON wrappers (bucket col, MoR key) must be JSON- and regex-safe:
    * a name containing a double quote (legal in Spark schemas) would
    * corrupt the wrapper irrecoverably, since the readers parse it by
    * regex (advice, round 12). BLACKLIST of the genuinely corrupting
    * characters — `"` (ends the wrapper regexes' `[^"]+`), `\` (JSON
    * escape) and controls — not an ASCII whitelist: spaces, `$`,
    * non-ASCII letters are legal Spark column names that round-trip
    * through the wrapper fine, and refusing them would break
    * previously-working DDL (review pass 1, round 13).
    */
  def requireSafeMetaName(kind: String, name: String): Unit =
    require(name.nonEmpty &&
        !name.exists(c => c == '"' || c == '\\' || c.isControl),
      s"$kind name '$name' is not representable in table metadata — " +
        "double quotes, backslashes and control characters cannot " +
        "round-trip through the meta wrapper")

  /** The evolved wrapper's text form (see [[WrappedBucketEvo]]). */
  def evoText(schema: StructType,
              specs: Seq[(Long, Option[(String, Int)])],
              currentId: Long): String = {
    val items = specs.map {
      case (id, Some((col, n))) =>
        requireSafeMetaName("bucket column", col)
        s"""[$id,"$col",$n]"""
      case (id, None) => s"""[$id,null,0]"""
    }.mkString(",")
    s"""{"graftBucketEvo":{"current":$currentId,"specs":[$items]},"schema":${schema.json}}"""
  }
}

object GraftLakeTable {

  /** V1 source Filter → Column, for the DELETE predicate. Covers the
    * comparison/null/set/boolean/string family; anything else makes
    * `canDeleteWhere` refuse (Spark then reports the DELETE as
    * unsupported instead of silently deleting the wrong rows).
    */
  private[graft] def filterToColumn(
      f: org.apache.spark.sql.sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.sources._
    def c(name: String) = col(s"`$name`")
    f match {
      case EqualTo(a, v) => Some(c(a) === lit(v))
      case EqualNullSafe(a, v) => Some(c(a) <=> lit(v))
      case GreaterThan(a, v) => Some(c(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case LessThan(a, v) => Some(c(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(c(a) <= lit(v))
      case In(a, vs) => Some(c(a).isInCollection(vs.toSeq))
      case IsNull(a) => Some(c(a).isNull)
      case IsNotNull(a) => Some(c(a).isNotNull)
      case StringStartsWith(a, v) => Some(c(a).startsWith(v))
      case StringEndsWith(a, v) => Some(c(a).endsWith(v))
      case StringContains(a, v) => Some(c(a).contains(v))
      case And(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(x) => filterToColumn(x).map(not)
      case _: AlwaysTrue => Some(lit(true))
      case _: AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  /** Resolve a manifest-relative file against the table dir. Plain
    * rows concatenate as always; a K51 transaction workspace's
    * `../<table>/<rel>` carried reference resolves through the PARENT
    * dir to a CLEAN path with no `..` component — HDFS and S3A reject
    * `..` path components outright, so the dot-dots must never reach
    * the filesystem (review pass 3, round 12). Every reader that turns
    * manifest rows into paths goes through here.
    */
  private[graft] def resolveFile(dir: String, rel: String): String =
    if (rel.startsWith("../"))
      new Path(new Path(dir).getParent, rel.substring(3)).toString
    else s"$dir/$rel"

  /** Manifest read instrumentation: every per-version manifest read
    * bumps this JVM-wide counter — what the memoization specs diff to
    * assert a steady-state stream poll costs ZERO manifest reads and a
    * new commit exactly one (the round-11 residue's assertion).
    */
  val manifestReads = new java.util.concurrent.atomic.AtomicLong()

  /** A committed version's (file, n_rows) rows. Read with an EXPLICIT
    * schema: a zero-row INSERT commits an EMPTY manifest version, and
    * schemaless `read.json` of an empty dir has no columns (the
    * JSON-manifests-drop-columns gotcha) — the explicit schema makes
    * the empty snapshot a first-class table state instead of an error.
    */
  def manifestRows(spark: SparkSession, manBase: String,
                   version: Long): Seq[(String, Long)] = {
    manifestReads.incrementAndGet()
    spark.read.schema("file STRING, n_rows BIGINT")
      .json(s"$manBase/manifest_v$version")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** A committed version's file list with the RETENTION contract both
    * streaming sources share (E38/E39): a version VACUUM swept fails
    * with one NAMED error instead of a raw missing-path read — and the
    * wording lives in exactly one place.
    */
  private[graft] def filesAtRetained(spark: SparkSession, manBase: String,
                                     version: Long, who: String): Seq[String] =
    rowsAtRetained(spark, manBase, version, who).map(_.file)

  /** [[filesAtRetained]] with the FULL manifest rows (seq + stats) —
    * what the change-data-feed derivation reads: it needs per-file
    * commit sequence numbers and key stats, under the same named
    * retention contract.
    */
  private[graft] def rowsAtRetained(spark: SparkSession, manBase: String,
                                    version: Long, who: String)
      : Seq[ManifestRow] = {
    if (version == 0L) return Seq.empty
    val versions = ManifestStore.versions(spark, manBase)
    if (!versions.contains(version))
      throw new IllegalStateException(
        s"$who: version $version is no longer committed " +
          s"(retained: ${versions.headOption.getOrElse(0L)}.." +
          s"${versions.lastOption.getOrElse(0L)}) — it fell out of VACUUM " +
          "retention; restart the stream from a retained startingVersion " +
          "or a fresh checkpoint")
    manifestRowsFull(spark, manBase, version)
  }

  /** One manifest row in full: table-dir-relative file, row count, txn
    * tag, and the per-file column stats `col -> [min, max]` (both cast
    * to string at write; see [[statColumns]] for the comparison rules).
    * Files committed before stats existed read back with an empty map —
    * the group filter then treats them as always-touched (conservative).
    */
  /** `seq` = the manifest version whose commit ADDED the file (carried
    * rows keep theirs) — the data-sequence-number half of the Iceberg
    * merge-on-read design: an equality-delete file applies exactly to
    * data files with a STRICTLY SMALLER seq, which is what lets a
    * DELETE+reinsert of the same key in one commit keep the reinserted
    * row. Pre-seq manifests read back 0 (all deletes apply —
    * conservative, and moot for tables that never had delete files).
    */
  /** `bytes` = the data file's on-disk length, measured by ONE
    * recursive listing of the commit's write dir (K49) — what feeds
    * [[GraftManifestStats]]' `sizeInBytes` so the planner can
    * auto-broadcast small lake tables. Pre-K49 manifests read back -1
    * ("unknown"); the estimator then falls back to rows × schema width,
    * never to the unbroadcastable conf default.
    */
  /** `spec` = the bucket-spec id current when the file was WRITTEN
    * (K50 partition-transform evolution): a file keeps its layout for
    * life, so the scan can only claim key-grouped partitioning when
    * EVERY live file's spec equals the table's current one — the
    * per-row tag (not a version cutoff) is what keeps a racing INSERT
    * that loaded the pre-evolution table honest: its files say spec N,
    * the read degrades to the flat scan, results stay correct.
    * Pre-evolution manifests read back 0 — the creation spec's id.
    */
  case class ManifestRow(file: String, nRows: Long, txn: String,
                         stats: Map[String, Seq[String]], seq: Long = 0L,
                         bytes: Long = -1L, spec: Long = 0L)

  def manifestRowsFull(spark: SparkSession, manBase: String,
                       version: Long): Seq[ManifestRow] = {
    manifestReads.incrementAndGet()
    spark.read
      .schema("file STRING, n_rows BIGINT, txn STRING, stats MAP<STRING, ARRAY<STRING>>, seq BIGINT, bytes BIGINT, spec BIGINT")
      .json(s"$manBase/manifest_v$version")
      .collect().map { r =>
        val stats = Option(r.getMap[String, scala.collection.Seq[String]](3))
          .map(_.map { case (k, v) => k -> v.toSeq }.toMap)
          .getOrElse(Map.empty[String, Seq[String]])
        ManifestRow(r.getString(0), r.getLong(1),
          Option(r.getString(2)).getOrElse(""), stats,
          if (r.isNullAt(4)) 0L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) 0L else r.getLong(6))
      }.toSeq
  }

  /** On-disk length per table-relative file (`<writeDir>/<name>`)
    * under ONE write directory, via one recursive listing — never a
    * per-file getFileStatus (driver round-trips scale with dirs, not
    * files). The ONE implementation both the commit's K49 `bytes`
    * measurement and the metadata tables' partition rollups share, so
    * their path arithmetic cannot drift (review finding, round 12).
    * Files missing from disk are simply absent; callers decide whether
    * that is a retention error or a NULL.
    */
  private[graft] def fileLengthsUnder(fs: org.apache.hadoop.fs.FileSystem,
                                      writeDir: Path): Map[String, Long] = {
    if (!fs.exists(writeDir)) return Map.empty
    val marker = s"/${writeDir.getName}/"
    val m = scala.collection.mutable.Map.empty[String, Long]
    val it = fs.listFiles(writeDir, true)
    while (it.hasNext) {
      val st = it.next()
      val abs = st.getPath.toString
      val idx = abs.lastIndexOf(marker)
      if (idx >= 0) m(abs.substring(idx + 1)) = st.getLen
    }
    m.toMap
  }

  /** Columns that get per-file min/max stats in the manifest — the
    * orderable top-level types whose string-cast min/max can be
    * compared CONSERVATIVELY on the driver: integrals and decimals via
    * BigDecimal, doubles likewise (NaN/Infinity fail the parse and the
    * file counts as touched), strings via unsigned UTF-8 bytes (Spark's
    * own string ordering), dates via the ISO `cast(... AS STRING)` form
    * which is lexicographically ordered. Timestamps and nested types
    * carry no stats — predicates on them never prune, which errs on
    * rewriting more files, never on losing rows.
    */
  private[graft] def statColumns(schema: StructType): Seq[org.apache.spark.sql.types.StructField] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.filter(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | DateType => true
      case _: DecimalType => true
      case _ => false
    })
  }

  /** Per-file (relative-path, n_rows, stats) for every parquet file
    * under `dataDir` — ONE read-back aggregate (K11's sidecar pass),
    * metadata-scale rows collected for the commit loop. Paths come
    * back RELATIVE to the table dir (`data_<writer>/part-…`) so the
    * whole table — history included — survives RENAME as one atomic
    * directory move.
    */
  /** `onlyFiles` (the Iceberg commit shape): restrict the stats pass
    * to files a committed task attempt REPORTED — what makes
    * speculative/retried attempts' orphan files invisible to the
    * commit (they stay unreferenced until VACUUM).
    */
  private[graft] def fileStats(spark: SparkSession, dataDir: String,
                               schema: StructType, bucketed: Boolean = false,
                               onlyFiles: Option[Seq[String]] = None)
      : Seq[(String, Long, Map[String, Seq[String]], Long)] = {
    import org.apache.spark.sql.functions.{max, min}
    val fs = new Path(dataDir).getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dataDir)) || onlyFiles.exists(_.isEmpty)) return Seq.empty
    val cols = statColumns(schema)
    // K53: per-file approx-NDV (HLL sketch, lgK=9 ≈ 512 B compact —
    // manifest weight stays bounded at 100 TB file counts; ~4.6%
    // relative error, plenty for join-order costing) and null counts,
    // merged driver-side at scan-stats time into the column statistics
    // the CBO's join reorder consumes. Values are cast to STRING
    // before sketching: the cast is 1:1 on every stat-column type, so
    // the NDV is preserved and one sketch shape covers them all.
    val ndvEnabled = spark.conf.getOption("spark.graft.stats.ndv.enabled")
      .forall(_.toBoolean)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { f =>
      val c = org.apache.spark.sql.functions.col(s"`${f.name}`")
      // K57 quantile vectors: the ORDER-PRESERVING NUMERIC PROXY per
      // type the histogram reader consumes — plain numerics cast to
      // double, DATE as its epoch-day number (r14 #7: date range
      // predicates over skewed calendars are the commonest real
      // filter, and FilterEstimation's toDouble reads date stats in
      // epoch days natively). DecimalType writes no vector (permanent
      // manifest weight no consumer reads — review pass 3); STRING
      // stays out of v2 (FilterEstimation has no double embedding for
      // strings, so a prefix-proxy histogram could never be consumed).
      val qProxy: Option[String] = f.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType =>
          Some(s"cast(`${f.name}` AS DOUBLE)")
        case org.apache.spark.sql.types.DateType =>
          Some(s"cast(unix_date(`${f.name}`) AS DOUBLE)")
        case _ => None
      }
      Seq(min(c).cast("string").as(s"__min_${f.name}"),
          max(c).cast("string").as(s"__max_${f.name}")) ++
        (if (ndvEnabled) Seq(
          org.apache.spark.sql.functions.base64(
            org.apache.spark.sql.functions.expr(
              s"hll_sketch_agg(cast(`${f.name}` AS STRING), 9)"))
            .as(s"__hll_${f.name}"),
          (count(lit(1)) - count(c)).as(s"__nulls_${f.name}"))
        else Seq.empty) ++
        // K57: a 33-point per-file quantile vector over the proxy
        // (ApproximatePercentile — native, codegen'd) — the mergeable
        // distribution summary the scan folds into an equi-height CBO
        // histogram (each file's vector defines a piecewise-linear
        // CDF; the snapshot's histogram inverts their row-weighted
        // mixture). ~0.7 KB per column per file.
        (if (ndvEnabled && qProxy.isDefined) Seq(
          org.apache.spark.sql.functions.expr(
            s"percentile_approx(${qProxy.get}, " +
              s"array(${(0 to 32).map(i => i / 32.0).mkString(",")}), 2500)")
            .as(s"__q_${f.name}"))
        else Seq.empty)
    }
    // a bucketed data dir carries the bucket id as a partition
    // DIRECTORY column — the read schema must name it or the files
    // fail to resolve; stats stay on the data columns only
    val readSchema =
      if (bucketed) schema.add("__graft_bucket", org.apache.spark.sql.types.IntegerType)
      else schema
    // relative-path marker = this write's own dir component (covers
    // data_<writer> and K39's deletes_<writer> alike)
    val marker = "/" + new Path(dataDir).getName
    val src = onlyFiles match {
      case Some(files) =>
        // basePath keeps the bucket partition-dir column resolvable
        // when reading explicit file paths
        spark.read.schema(readSchema).option("basePath", dataDir).parquet(files: _*)
      case None => spark.read.schema(readSchema).parquet(dataDir)
    }
    // K49: on-disk lengths from ONE recursive listing of the write dir
    // (driver-side, bounded by this commit's file count) — they ride
    // the manifest as `bytes` so scan statistics never re-list files
    val lens: Map[String, Long] = fileLengthsUnder(fs, new Path(dataDir))
    src.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val abs = r.getString(0)
        val idx = abs.lastIndexOf(marker)
        require(idx >= 0, s"unexpected data file path $abs")
        val minmax = cols.flatMap { f =>
          val mn = r.getString(r.fieldIndex(s"__min_${f.name}"))
          val mx = r.getString(r.fieldIndex(s"__max_${f.name}"))
          // an all-null file has null min/max — no stats entry, so a
          // predicate on the column keeps the file touched
          if (mn == null || mx == null) None
          else Some(f.name -> Seq(mn, mx))
        }
        // K53/K57 entries ride the same map under reserved '#'-keys
        // (never a plain column-name lookup, so pruning/rewrite
        // consumers are untouched)
        val ndv =
          if (!ndvEnabled) Seq.empty
          else cols.flatMap { f =>
            val sk = r.getString(r.fieldIndex(s"__hll_${f.name}"))
            val nulls = r.getLong(r.fieldIndex(s"__nulls_${f.name}"))
            val hasQ = f.dataType match {
              case org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.LongType |
                   org.apache.spark.sql.types.FloatType |
                   org.apache.spark.sql.types.DoubleType |
                   org.apache.spark.sql.types.DateType => true
              case _ => false
            }
            val quant =
              if (!hasQ) Seq.empty
              else Option(r.getAs[scala.collection.Seq[Double]](s"__q_${f.name}"))
                .filter(_.length == 33)
                .map(q => s"__q#${f.name}" -> q.map(_.toString).toSeq).toSeq
            (if (sk == null) Seq.empty
             else Seq(s"__hll#${f.name}" -> Seq(sk))) ++ quant :+
              (s"__nulls#${f.name}" -> Seq(nulls.toString))
          }
        val rel = abs.substring(idx + 1)
        (rel, r.getLong(1), (minmax ++ ndv).toMap, lens.getOrElse(rel, -1L))
      }.toSeq
  }

  /** Every transaction tag committed under `manBase`, across ALL
    * versions (an overwrite drops prior FILES from the current list
    * but its version — and its txn — stays committed). The tag rides
    * the manifest rows themselves, so "data committed" and "txn
    * recorded" are ONE atomic rename — the property idempotent
    * streaming writes stand on (Delta's txn/appId pattern): a
    * redelivered micro-batch finds its tag and skips, a batch whose
    * writer died before the rename left neither data nor tag.
    */
  def committedTxns(spark: SparkSession, manBase: String): Set[String] =
    ManifestStore.versions(spark, manBase).flatMap { v =>
      spark.read.schema("file STRING, n_rows BIGINT, txn STRING")
        .json(s"$manBase/manifest_v$v")
        .collect().flatMap(r => Option(r.getString(2))).filter(_.nonEmpty)
    }.toSet

  /** One INSERT = one immutable data dir + ONE committed manifest
    * version. Appends serialize through the same optimistic loop as
    * [[graft.sinks.TableStore.mergeCdc]]: commit at exactly
    * `basedOn + 1`, and on losing the race re-read the WINNER'S file
    * list and retry — two concurrent INSERTs both land, in some order,
    * with no lost files. The data write itself happens once; retries
    * move metadata only.
    */
  def insert(spark: SparkSession, dir: String, data: DataFrame,
             overwrite: Boolean, maxRetries: Int = 50,
             txn: String = "", bucketSpec: Option[(String, Int)] = None,
             specId: Long = 0L): Unit = {
    val writerId = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$dir/data_$writerId"
    writeData(dataDir, data, bucketSpec)
    commitAppend(spark, dir, dataDir, data.schema, overwrite, txn,
      bucketed = bucketSpec.isDefined, maxRetries = maxRetries, specId = specId)
  }

  /** The append-commit half of [[insert]], shared with K46's V2
    * bucketed write (whose data lands through the single-pass router
    * before this runs): per-file stats in one read-back aggregate
    * (K11's sidecar pass — the stats feed MERGE/UPDATE's runtime group
    * filter), then the optimistic publish loop. The txn tag rides THIS
    * version's new rows only (empty string, never null — JSON
    * read-back drops all-null columns); carried rows keep their stats
    * but get txn "" so a carried file never re-asserts an old txn.
    */
  private[graft] def commitAppend(spark: SparkSession, dir: String,
                                  dataDir: String, schema: StructType,
                                  overwrite: Boolean, txn: String,
                                  bucketed: Boolean,
                                  onlyFiles: Option[Seq[String]] = None,
                                  maxRetries: Int = 50,
                                  specId: Long = 0L): Unit = {
    val manBase = s"$dir/manifest"
    val newRows = fileStats(spark, dataDir, schema, bucketed, onlyFiles)
    var attempt = 0
    while (attempt <= maxRetries) {
      attempt += 1
      val basedOn = ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
      val carried =
        if (overwrite || basedOn == 0L) Seq.empty
        else manifestRowsFull(spark, manBase, basedOn)
      val manifest = publishRows(spark,
        carried.map(_.copy(txn = "")) ++
          newRows.map { case (f, n, st, b) =>
            ManifestRow(f, n, txn, st, basedOn + 1, b, specId) })
      if (ManifestStore.tryPublish(spark, manBase, manifest, basedOn + 1)) return
    }
    throw new java.io.IOException(
      s"append under $dir lost the commit race $attempt times")
  }

  /** One data-dir write, bucket-routed when the table is bucketed:
    * directory partitioning on the computed bucket id means every file
    * holds exactly one bucket (what `HasPartitionKey` needs), the id
    * rides the path, and the data columns stay bucket-free.
    * `pmod(hash, n)` here MUST match [[GraftBucketed.bucketId]].
    */
  private[graft] def writeData(dataDir: String, data: DataFrame,
                               bucketSpec: Option[(String, Int)]): Unit =
    bucketSpec match {
      case Some((col, n)) =>
        import org.apache.spark.sql.functions.{hash, pmod}
        data.withColumn("__graft_bucket",
            pmod(hash(org.apache.spark.sql.functions.col(s"`$col`")), lit(n)))
          .write.mode(SaveMode.ErrorIfExists)
          .partitionBy("__graft_bucket").parquet(dataDir)
      case None =>
        data.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    }

  /** The replace-groups commit shared by DELETE and the row-level
    * write: publish ONE version = `basedOn`'s rows minus `replaced`
    * (carried by reference, stats preserved) plus the files under
    * `dataDir`, through the optimistic loop, aborting if a racing
    * committer removed a replaced file (write-serializable; concurrent
    * appends commute).
    */
  /** The session-conf key a caller sets to tag a SQL DML statement's
    * commit with a transaction id (the Delta txn/appId pattern on the
    * STATEMENT surface, where no writer-option plumbing exists) —
    * read once at commit time; `foreachBatch` bodies are synchronous,
    * so set-before / unset-after brackets exactly one statement. The
    * tag rides the commit's NEW manifest rows; a DML whose rewrite
    * produces zero new files records no tag (its replay is
    * semantically idempotent anyway — deleting deleted rows).
    */
  val TxnConfKey = "spark.graft.commit.txn"

  private[graft] def commitReplace(spark: SparkSession, dir: String,
                                   dataDir: String, replaced: Set[String],
                                   schema: StructType, bucketed: Boolean,
                                   opDesc: String, maxRetries: Int = 50,
                                   onlyFiles: Option[Seq[String]] = None,
                                   specId: Long = 0L): Unit = {
    val manBase = s"$dir/manifest"
    val txn = spark.conf.getOption(TxnConfKey).getOrElse("")
    val newRows = fileStats(spark, dataDir, schema, bucketed, onlyFiles)
    var attempt = 0
    while (attempt <= maxRetries) {
      attempt += 1
      val basedOn = ManifestStore.versions(spark, manBase).lastOption.getOrElse(0L)
      val current =
        if (basedOn == 0L) Seq.empty
        else manifestRowsFull(spark, manBase, basedOn)
      val live = current.map(_.file).toSet
      val gone = replaced -- live
      if (gone.nonEmpty)
        throw new java.io.IOException(
          s"$opDesc: concurrent commit removed rewritten file(s) " +
            s"${gone.take(3).mkString(", ")} — retry the statement")
      val carried = current.filterNot(r => replaced.contains(r.file))
      val manifest = publishRows(spark,
        carried.map(_.copy(txn = "")) ++
          newRows.map { case (f, n, st, b) =>
            ManifestRow(f, n, txn, st, basedOn + 1, b, specId) })
      if (ManifestStore.tryPublish(spark, manBase, manifest, basedOn + 1)) return
    }
    throw new java.io.IOException(
      s"$opDesc lost the commit race $attempt times")
  }

  /** Bucket transform over an UNPARSED single-part column reference —
    * `Expressions.bucket(n, col)` runs the name through the SQL
    * identifier parser, so a legal exotic column name (`order id`)
    * crashes every read/write of the table it buckets (review pass 1,
    * round 13).
    */
  private[graft] def bucketTransform(n: Int, col: String)
      : org.apache.spark.sql.connector.expressions.Transform =
    org.apache.spark.sql.connector.expressions.LogicalExpressions.bucket(n,
      Array[org.apache.spark.sql.connector.expressions.NamedReference](
        org.apache.spark.sql.connector.expressions.FieldReference(Seq(col))))

  /** Manifest rows -> the DataFrame shape every commit publishes. */
  private[graft] def publishRows(spark: SparkSession,
                                 rows: Seq[ManifestRow]): DataFrame = {
    import spark.implicits._
    rows.map(r => (r.file, r.nRows, r.txn, r.stats, r.seq, r.bytes, r.spec))
      .toDF("file", "n_rows", "txn", "stats", "seq", "bytes", "spec")
  }
}
