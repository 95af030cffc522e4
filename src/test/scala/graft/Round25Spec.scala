package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.graft.{GraftCdfSource, GraftLakeTable}
import org.apache.spark.sql.types.StructType

import graft.sinks.ManifestStore

/** Round-12 specs: the change-data-feed cost class (O(change) per
  * commit, derived from the manifest delta — the round-11 weak-grade
  * fix), per-trigger version admission control, the equality-delete
  * CDF rung, and executor-side position-delete files.
  */
class Round25Spec extends SparkSpec {

  private val cat = "graft"

  private def ensure(): Unit = graft.queries.IOQueries.ensureCatalog(spark)

  private def tableDir(table: String): String =
    graft.queries.IOQueries.catalogRoot + s"/lake/$table"
  private def manBase(table: String): String = tableDir(table) + "/manifest"

  private def manifestFiles(table: String): Seq[String] = {
    val mb = manBase(table)
    ManifestStore.versions(spark, mb).lastOption
      .map(v => GraftLakeTable.manifestRowsFull(spark, mb, v).map(_.file))
      .getOrElse(Seq.empty)
  }

  private def freshPosTable(name: String): Unit = {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.$name")
    spark.sql(
      s"""CREATE TABLE $cat.lake.$name (k BIGINT NOT NULL, v STRING, amt DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.mode'='position')""".stripMargin)
  }

  private def cdfSourceFor(table: String, maxVersions: Int = 128): GraftCdfSource =
    new GraftCdfSource(spark, manBase(table), "k",
      spark.table(s"$cat.lake.$table").schema, None, Some(tableDir(table)),
      Some(s"$cat.lake.$table"), maxVersions)

  /** Input files of every file scan in the executed plan — the cost
    * the O(change) law pins (the derivation reads via
    * `spark.read.parquet`, which plans [[FileSourceScanExec]]).
    */
  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.relation.location.inputFiles.length
    }.sum

  test("cdf cost class: a 1-row DML's change step reads O(change) files, not O(table)") {
    freshPosTable("cdf_cost")
    // six single-row INSERTs = six committed versions, >= 6 data files
    (1 to 6).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.cdf_cost VALUES ($i,'v$i',$i.0)"))
    val dataFiles = manifestFiles("cdf_cost").count(_.startsWith("data_"))
    assert(dataFiles >= 6, s"precondition: one data file per insert, got $dataFiles")
    spark.sql(s"DELETE FROM $cat.lake.cdf_cost WHERE k = 3") // v7, touches 1 file
    val src = cdfSourceFor("cdf_cost")
    val step = src.changesOf(7L)
    val read = scannedFiles(step)
    // the 1-row DELETE's step may read its posdel file and the ONE
    // data file it names — never the other five data files
    assert(read <= 3,
      s"a 1-row DML's change step must read O(change) files " +
        s"(table has $dataFiles data files, step read $read)")
    val rows = step.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).toSeq
    assert(rows == Seq((3L, "delete", 7L)), s"change rows: $rows")
  }

  test("cdf cost class: a pure append's step reads only the added files, with no join") {
    freshPosTable("cdf_app")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.cdf_app VALUES ($i,'v$i',$i.0)"))
    val src = cdfSourceFor("cdf_app")
    val step = src.changesOf(3L) // one mid-history append
    assert(scannedFiles(step) == 1,
      s"an append step must read exactly its added file, got ${scannedFiles(step)}")
    val joins = step.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"a pure append must short-circuit to inserts with no join:\n" +
        step.queryExecution.executedPlan)
    val rows = step.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSeq
    assert(rows == Seq((3L, "insert")), s"append step rows: $rows")
  }

  test("cdf cost class: a row-preserving rewrite (compact_deletes) emits zero changes") {
    freshPosTable("cdf_cmp")
    spark.sql(s"INSERT INTO $cat.lake.cdf_cmp VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"DELETE FROM $cat.lake.cdf_cmp WHERE k = 2")
    spark.sql(s"CALL $cat.system.compact_deletes('lake.cdf_cmp')") // v3
    val src = cdfSourceFor("cdf_cmp")
    val step = src.changesOf(3L)
    assert(step.count() == 0L,
      "a compaction rewrites files but changes no rows — its CDF step must be empty")
  }

  test("cdf admission control: maxVersionsPerTrigger bounds each batch's version range") {
    freshPosTable("cdf_cap")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.cdf_cap VALUES ($i,'v$i',$i.0)"))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val capped = cdfSourceFor("cdf_cap", maxVersions = 1)
    val o1 = capped.getOffset.get
    assert(o1 == LongOffset(1L), s"first capped offset: $o1")
    // getBatch returns the streaming-marked bridge frame — advance
    // progress through it, assert contents off the testable step plan
    capped.getBatch(None, o1)
    assert(capped.changesOf(1L).collect()
      .map(_.getAs[Long]("_commit_version")).toSet == Set(1L))
    val o2 = capped.getOffset.get
    assert(o2 == LongOffset(2L), s"second capped offset: $o2")
    capped.getBatch(Some(o1), o2)
    val o3 = capped.getOffset.get
    assert(o3 == LongOffset(3L), s"third capped offset: $o3")
    capped.getBatch(Some(o2), o3)
    assert(capped.getOffset.get == LongOffset(3L),
      "a drained capped source must report its own progress, never regress")
    // the uncapped default admits the whole pending range at once
    val uncapped = cdfSourceFor("cdf_cap")
    assert(uncapped.getOffset.get == LongOffset(3L),
      s"default admission: ${uncapped.getOffset}")
  }

  test("posdelta: a broad DELETE spills position-delete files executor-side; " +
      "commit messages carry file names, not a million pairs") {
    freshPosTable("pos_big")
    spark.sql(
      s"""INSERT INTO $cat.lake.pos_big
         |SELECT id, cast(id AS STRING), cast(id AS DOUBLE) FROM range(1000000)""".stripMargin)
    val dataFiles = manifestFiles("pos_big").count(_.startsWith("data_"))
    assert(dataFiles >= 2, s"precondition: a multi-file table, got $dataFiles")
    // ~900k deleted rows across every data file: each DML task passes
    // the spill threshold (65536) and writes its OWN posdel parquet at
    // a final path — the commit message then carries only the name
    spark.sql(s"DELETE FROM $cat.lake.pos_big WHERE k % 10 <> 0")
    val posFiles = manifestFiles("pos_big").filter(_.startsWith("posdel_"))
    assert(posFiles.length >= 2,
      s"a broad DELETE must land one executor-written posdel file per " +
        s"task, not one driver-funneled file: $posFiles")
    assert(posFiles.forall(f => !f.contains("part-driver-")),
      s"no task under the threshold, so no driver-side fold file: $posFiles")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.pos_big").head.getLong(0)
      == 100000L, "masked read after the broad delete")
    // the targeted-DML fast path still folds small tasks into ONE
    // driver-written file (no per-task file litter for a 1-row DELETE)
    spark.sql(s"DELETE FROM $cat.lake.pos_big WHERE k = 0")
    val afterSmall = manifestFiles("pos_big").filter(_.startsWith("posdel_"))
    val newFiles = afterSmall.toSet -- posFiles.toSet
    assert(newFiles.size == 1 && newFiles.head.contains("part-driver-"),
      s"a 1-row DELETE folds into one driver-written posdel file: $newFiles")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.pos_big").head.getLong(0)
      == 99999L)
  }

  test("stream source: per-version file sets are memoized — a steady-state poll reads " +
      "zero manifests, a new commit exactly one") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.memo_t")
    spark.sql(s"CREATE TABLE $cat.lake.memo_t (k BIGINT, v DOUBLE)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO $cat.lake.memo_t VALUES ($i, $i.0)"))
    val stream = new org.apache.spark.sql.graft.GraftMicroBatchStream(
      tableDir("memo_t"), spark.table(s"$cat.lake.memo_t").schema,
      ignoreChanges = false)
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(100)
    val start = stream.initialOffset()
    val reads = GraftLakeTable.manifestReads
    val r0 = reads.get()
    val o1 = stream.latestOffset(start, limit)
    val firstPoll = reads.get() - r0
    assert(firstPoll <= 3L,
      s"the first admission poll reads each candidate version once, got $firstPoll")
    // steady state: the same poll again must hit the cache only
    val r1 = reads.get()
    assert(stream.latestOffset(start, limit) == o1)
    assert(reads.get() - r1 == 0L,
      s"a no-new-commits poll must read ZERO manifests, got ${reads.get() - r1}")
    // one new commit => exactly one new manifest read on the next poll
    spark.sql(s"INSERT INTO $cat.lake.memo_t VALUES (4, 4.0)")
    val r2 = reads.get()
    stream.latestOffset(start, limit)
    assert(reads.get() - r2 == 1L,
      s"a poll after ONE new commit must read exactly one manifest, got ${reads.get() - r2}")
  }

  test("t.partitions_history: drift across versions; swept bytes go NULL, pinned partitions fails named") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.pm_h")
    spark.sql(s"CREATE TABLE $cat.lake.pm_h (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.pm_h VALUES (1, 1.0)")          // v1
    spark.sql(s"INSERT INTO $cat.lake.pm_h VALUES (2, 2.0)")          // v2
    spark.sql(s"INSERT OVERWRITE $cat.lake.pm_h VALUES (3, 3.0)")     // v3
    val full = spark.sql(
      s"SELECT version, n_rows, bytes FROM $cat.lake.pm_h.partitions_history " +
        "ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
    assert(full == Seq((1L, 1L, false), (2L, 2L, false), (3L, 1L, false)),
      s"drift rollup: $full")
    // the pin truncates the history (same law as t.history)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.lake.pm_h.partitions_history VERSION AS OF 2")
      .head.getLong(0) == 2L)
    // out-of-band sweep of v1/v2's files (what VACUUM does after the
    // overwrite): history rows stay readable with NULL bytes; the
    // PINNED single-version rollup fails the named retention error
    val v1Files = GraftLakeTable.manifestRowsFull(spark, manBase("pm_h"), 1L)
    val fs = new org.apache.hadoop.fs.Path(tableDir("pm_h"))
      .getFileSystem(spark.sessionState.newHadoopConf())
    v1Files.foreach(r => fs.delete(
      new org.apache.hadoop.fs.Path(tableDir("pm_h"), r.file), false))
    val after = spark.sql(
      s"SELECT version, n_rows, bytes FROM $cat.lake.pm_h.partitions_history " +
        "ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
    assert(after == Seq((1L, 1L, true), (2L, 2L, true), (3L, 1L, false)),
      s"swept versions must report NULL bytes, manifest-true rows: $after")
    val err = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.lake.pm_h.partitions VERSION AS OF 1").collect())
    assert(err.getMessage.contains("fell out of VACUUM retention"),
      s"a pinned rollup over swept files must fail named: ${err.getMessage}")
  }

  test("optimize zorder: a 3-D box over numeric+date+string dims touches a bounded file count") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.zo3")
    spark.sql(s"CREATE TABLE $cat.lake.zo3 (x BIGINT, dt DATE, s STRING, v DOUBLE)")
    // a 16x16x16 uniform grid: x numeric, dt one of 16 days, s one of
    // 16 single-char strings — inserted x-striped so the pre-zorder
    // layout sorts on ONE axis only (the case zorder fixes)
    spark.sql(
      s"""INSERT INTO $cat.lake.zo3
         |SELECT id % 16 AS x,
         |       date_add(DATE'2020-01-01', cast((id DIV 16) % 16 AS INT)) AS dt,
         |       chr(97 + (id DIV 256) % 16) AS s,
         |       cast(id AS DOUBLE) AS v
         |FROM range(4096)""".stripMargin)
    val metrics = spark.sql(
      s"CALL $cat.system.optimize('lake.zo3', 256, array('x', 'dt', 's'))")
      .collect().head
    assert(metrics.getLong(2) == 16L,
      s"4096 rows at target 256 must land 16 curve-segment files: $metrics")
    def touched(sql: String): Long = {
      val df = spark.sql(sql)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: org.apache.spark.sql.graft.GraftLakeScan => g.inner match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length.toLong
              case _ => fail("expected the pruned parquet scan")
            }
            case other => fail(s"unexpected scan $other")
          }
      }.sum
    }
    // the 3-D pruning LAW: an octant (1/8 of the volume) is a
    // contiguous Morton range — at most 2 of 16 segments plus a
    // boundary file per side
    val octant = touched(
      s"SELECT * FROM $cat.lake.zo3 WHERE x <= 7 " +
        "AND dt <= DATE'2020-01-08' AND s <= 'h'")
    assert(octant <= 4L, s"a 1/8 octant must touch <= 4 of 16 files, got $octant")
    // every axis — including the DATE and STRING proxies — prunes
    // individually (the whole point vs one sorted dimension)
    val xS = touched(s"SELECT * FROM $cat.lake.zo3 WHERE x <= 3")
    val dS = touched(s"SELECT * FROM $cat.lake.zo3 WHERE dt <= DATE'2020-01-04'")
    val sS = touched(s"SELECT * FROM $cat.lake.zo3 WHERE s <= 'd'")
    assert(xS < 16L && dS < 16L && sS < 16L,
      s"single-axis slices must prune on all three dims: x=$xS dt=$dS s=$sS")
    // correctness: the octant holds exactly its 8*8*8 grid points
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.lake.zo3 WHERE x <= 7 " +
        "AND dt <= DATE'2020-01-08' AND s <= 'h'").head.getLong(0) == 512L)
  }

  test("optimize zorder: refusal matrix — dim count and unsupported types fail loudly") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.zo_ref")
    spark.sql(
      s"CREATE TABLE $cat.lake.zo_ref (x BIGINT, y BIGINT, z BIGINT, w BIGINT, " +
        "q BIGINT, ts TIMESTAMP)")
    spark.sql(s"INSERT INTO $cat.lake.zo_ref VALUES (1,1,1,1,1,TIMESTAMP'2020-01-01 00:00:00')")
    def refuse(cols: String): String =
      intercept[Exception](spark.sql(
        s"CALL $cat.system.optimize('lake.zo_ref', 100, array($cols))")
      ).getMessage
    assert(refuse("'x'").contains("2 to 4"), "one dim must refuse")
    assert(refuse("'x','y','z','w','q'").contains("2 to 4"), "five dims must refuse")
    assert(refuse("'x','ts'").contains("must be numeric, DATE or STRING"),
      "a timestamp dim must refuse (K35 keeps no stats for it)")
    assert(refuse("'x','nope'").contains("not in the table schema"))
  }

  test("cdf over equality-delete merge-on-read: DML diffs as deletes and updates") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.cdf_eq")
    spark.sql(
      s"""CREATE TABLE $cat.lake.cdf_eq (k BIGINT NOT NULL, amt DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.cdf_eq VALUES (1,1.0),(2,2.0),(3,3.0)")
    spark.sql(s"DELETE FROM $cat.lake.cdf_eq WHERE k = 2")        // v2: eq-delete file
    spark.sql(s"UPDATE $cat.lake.cdf_eq SET amt = 9.0 WHERE k = 3") // v3: delete + reinsert
    val q = spark.readStream.format("graft-cdf")
      .option("table", s"$cat.lake.cdf_eq").option("key", "k").load()
      .writeStream.format("memory").queryName("cdf_eq")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_cdfeq").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql(
      "SELECT _commit_version, _change_type, k, amt FROM cdf_eq " +
        "ORDER BY _commit_version, _change_type, k")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, "insert", 1L, 1.0), (1L, "insert", 2L, 2.0), (1L, "insert", 3L, 3.0),
      (2L, "delete", 2L, 2.0),
      (3L, "update_postimage", 3L, 9.0), (3L, "update_preimage", 3L, 3.0)),
      s"equality-MoR change feed: $got")
    // the already-masked key must NOT re-diff on a later commit: one
    // more unrelated DELETE, and k=2 stays out of its step
    spark.sql(s"DELETE FROM $cat.lake.cdf_eq WHERE k = 1") // v4
    val step = cdfSourceFor("cdf_eq").changesOf(4L)
    val s4 = step.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSeq
    assert(s4 == Seq((1L, "delete")),
      s"an already-masked key must not re-diff as a delete: $s4")
  }
}
