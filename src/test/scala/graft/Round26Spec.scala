package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.graft.GraftLakeTable

import graft.sinks.ManifestStore

/** Round-12 batch-2 specs: manifest-fed scan statistics (K49) — exact
  * byte/row accounting, the pruned-list contract, the broadcast
  * consequence, the unknown-bytes fallback — and the bench load
  * sentinel.
  */
class Round26Spec extends SparkSpec {

  private val cat = "graft"

  private def ensure(): Unit = graft.queries.IOQueries.ensureCatalog(spark)

  private def tableDir(table: String): String =
    graft.queries.IOQueries.catalogRoot + s"/lake/$table"
  private def manBase(table: String): String = tableDir(table) + "/manifest"

  private def latestRows(table: String): Seq[GraftLakeTable.ManifestRow] = {
    val mb = manBase(table)
    GraftLakeTable.manifestRowsFull(spark, mb,
      ManifestStore.versions(spark, mb).last)
  }

  /** The reported stats of a DataFrame's (single) V2 scan relation. */
  private def reportedStats(df: DataFrame): (Long, Long) = {
    val st = df.queryExecution.optimizedPlan.collectFirst {
      case s: DataSourceV2ScanRelation =>
        s.scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }.getOrElse(fail("no DataSourceV2ScanRelation in the plan"))
    (if (st.numRows.isPresent) st.numRows.getAsLong else -1L,
      if (st.sizeInBytes.isPresent) st.sizeInBytes.getAsLong else -1L)
  }

  test("manifest stats: bytes in the manifest equal the on-disk lengths exactly; " +
      "flat-scan stats are manifest-exact") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_flat")
    spark.sql(s"CREATE TABLE $cat.lake.st_flat (k BIGINT, v DOUBLE)")
    spark.sql(
      s"INSERT INTO $cat.lake.st_flat SELECT id, id * 1.5 FROM range(0, 1000)")
    spark.sql(
      s"INSERT INTO $cat.lake.st_flat SELECT id, id * 1.5 FROM range(1000, 1500)")
    val rows = latestRows("st_flat")
    assert(rows.nonEmpty && rows.forall(_.bytes > 0L),
      s"every committed file must carry measured bytes: $rows")
    val fs = new Path(tableDir("st_flat"))
      .getFileSystem(spark.sessionState.newHadoopConf())
    rows.foreach { r =>
      val onDisk = fs.getFileStatus(new Path(tableDir("st_flat"), r.file)).getLen
      assert(r.bytes == onDisk,
        s"${r.file}: manifest bytes ${r.bytes} != on-disk $onDisk")
    }
    val (n, b) = reportedStats(spark.table(s"$cat.lake.st_flat"))
    assert(n == 1500L, s"numRows must be manifest-exact, got $n")
    assert(b == rows.map(_.bytes).sum, s"sizeInBytes must be the manifest sum, got $b")
  }

  test("manifest stats: a stat-pruned scan reports its POST-PUSHDOWN size") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_pruned")
    spark.sql(s"CREATE TABLE $cat.lake.st_pruned (k BIGINT, v DOUBLE)")
    // two disjoint key ranges in two commits → two files with disjoint
    // min/max stats; a range predicate prunes one of them
    spark.sql(
      s"INSERT INTO $cat.lake.st_pruned SELECT id, id * 1.0 FROM range(0, 1000)")
    spark.sql(
      s"INSERT INTO $cat.lake.st_pruned SELECT id, id * 1.0 FROM range(5000, 6000)")
    val (fullN, fullB) = reportedStats(spark.table(s"$cat.lake.st_pruned"))
    val (prunedN, prunedB) = reportedStats(
      spark.table(s"$cat.lake.st_pruned").where("k < 1000"))
    assert(fullN == 2000L)
    assert(prunedN == 1000L,
      s"the filtered scan must report only surviving files' rows, got $prunedN")
    assert(prunedB < fullB,
      s"pruned sizeInBytes $prunedB must drop below the full $fullB")
  }

  test("manifest stats: a small dim table broadcasts STATICALLY, with no hint") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_dim")
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_fact")
    spark.sql(s"CREATE TABLE $cat.lake.st_dim (k BIGINT, name STRING)")
    spark.sql(
      s"INSERT INTO $cat.lake.st_dim SELECT id, concat('g', id) FROM range(0, 50)")
    spark.sql(s"CREATE TABLE $cat.lake.st_fact (k BIGINT, amt DOUBLE)")
    spark.sql(
      s"INSERT INTO $cat.lake.st_fact SELECT id % 50, id * 1.0 FROM range(0, 20000)")
    val joined = spark.sql(
      s"""SELECT name, sum(amt) AS total
         |FROM $cat.lake.st_fact f JOIN $cat.lake.st_dim d ON f.k = d.k
         |GROUP BY name""".stripMargin)
    // sparkPlan = the STATIC physical plan, before AQE could rescue the
    // join from runtime sizes — only the reported stats can put a
    // BroadcastHashJoin here
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim side must broadcast off manifest stats alone:\n$plan")
  }

  test("manifest stats: position deletes subtract EXACTLY; equality deletes do not") {
    ensure()
    // positional MoR: 1000 rows, delete 100 → numRows must be 900
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_pos")
    spark.sql(
      s"""CREATE TABLE $cat.lake.st_pos (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.mode'='position')""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.lake.st_pos SELECT id, id * 1.0 FROM range(0, 1000)")
    spark.sql(s"DELETE FROM $cat.lake.st_pos WHERE k % 10 = 0")
    val (posN, posB) = reportedStats(spark.table(s"$cat.lake.st_pos"))
    assert(posN == 900L, s"position-MoR numRows must subtract the vectors, got $posN")
    assert(posB > 0L)
    // equality MoR: since K58 (r14 #4) the distinct delete-key mass IS
    // subtracted — exact under the key-uniqueness contract equality
    // deletes already rely on, and what lets a half-deleted dim keep
    // its static broadcast (the r12-era no-subtraction pin is
    // superseded; Round28Spec carries the full exactness/per-file
    // bound laws)
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_eq")
    spark.sql(
      s"""CREATE TABLE $cat.lake.st_eq (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.lake.st_eq SELECT id, id * 1.0 FROM range(0, 1000)")
    spark.sql(s"DELETE FROM $cat.lake.st_eq WHERE k < 100")
    val (eqN, eqB) = reportedStats(spark.table(s"$cat.lake.st_eq"))
    assert(eqN == 900L,
      s"equality-MoR numRows subtracts the delete-key mass (K58), got $eqN")
    assert(eqB > 0L)
    // and the delete FILES' bytes/rows never count as data
    val eqRows = latestRows("st_eq")
    assert(eqRows.exists(_.file.startsWith("deletes_")),
      "the DELETE must have landed an equality-delete file")
  }

  test("manifest stats: bucketed scans report manifest-exact stats") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.st_bucket")
    spark.sql(
      s"""CREATE TABLE $cat.lake.st_bucket (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.lake.st_bucket SELECT id, id * 1.0 FROM range(0, 800)")
    val (n, b) = reportedStats(spark.table(s"$cat.lake.st_bucket"))
    assert(n == 800L, s"bucketed numRows must be manifest-exact, got $n")
    assert(b == latestRows("st_bucket").map(_.bytes).sum)
  }

  test("manifest stats: unknown bytes (pre-K49 manifests) fall back to a " +
      "rows-based estimate, never to 'huge'") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val legacy = Seq(
      GraftLakeTable.ManifestRow("data_x/part-0.parquet", 1000L, "", Map.empty),
      GraftLakeTable.ManifestRow("data_x/part-1.parquet", 500L, "", Map.empty, 0L, 4096L))
    val st = org.apache.spark.sql.graft.GraftManifestStats.of(legacy, schema)
    assert(st.numRows.getAsLong == 1500L)
    val expected = 1000L * schema.defaultSize + 4096L
    assert(st.sizeInBytes.getAsLong == expected,
      s"mixed known/unknown bytes must sum estimate + measured, got " +
        s"${st.sizeInBytes.getAsLong} (expected $expected)")
  }

  test("bucket evolution: hand data stays correct through evolve + DML, and " +
      "ALTER ADD COLUMN preserves the spec history") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.evo_hand")
    spark.sql(
      s"""CREATE TABLE $cat.lake.evo_hand (k BIGINT, v STRING)
         |PARTITIONED BY (bucket(2, k))""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.evo_hand VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql(s"CALL $cat.system.set_bucketing('lake.evo_hand', 'k', 3)")
    spark.sql(s"INSERT INTO $cat.lake.evo_hand VALUES (4,'d'),(5,'e'),(6,'f')")
    // DML across MIXED specs: the copy-on-write rewrite lands survivors
    // under the CURRENT spec
    spark.sql(s"DELETE FROM $cat.lake.evo_hand WHERE k = 3")
    val got = spark.table(s"$cat.lake.evo_hand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (4L, "d"), (5L, "e"), (6L, "f")))
    // schema evolution on an evolved table must NOT refold the meta
    // into the single-spec legacy form (that would relabel every
    // old-spec file as current and silently re-enable a wrong SPJ)
    spark.sql(s"ALTER TABLE $cat.lake.evo_hand ADD COLUMN extra DOUBLE")
    val specs = latestRows("evo_hand").map(_.spec).toSet
    assert(specs.contains(1L), s"post-evolution writes must carry spec 1: $specs")
    val again = spark.table(s"$cat.lake.evo_hand")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got, "ADD COLUMN after evolution must not change reads")
    // a further INSERT still routes by the evolved spec
    spark.sql(s"INSERT INTO $cat.lake.evo_hand VALUES (9,'i',1.5)")
    assert(latestRows("evo_hand").exists(r =>
      r.spec == 1L && r.file.contains("__graft_bucket=")),
      "post-ALTER inserts must keep the evolved bucket routing")
  }

  test("bucket evolution: evolve to FLAT (n=0) and back; writes follow the " +
      "current spec") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.evo_flat")
    spark.sql(
      s"""CREATE TABLE $cat.lake.evo_flat (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(2, k))""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.evo_flat SELECT id, id*1.0 FROM range(0, 100)")
    spark.sql(s"CALL $cat.system.set_bucketing('lake.evo_flat', 'none', 0)")
    spark.sql(s"INSERT INTO $cat.lake.evo_flat SELECT id, id*1.0 FROM range(100, 200)")
    val rows = latestRows("evo_flat")
    val flatNew = rows.filter(_.spec == 1L)
    assert(flatNew.nonEmpty && flatNew.forall(!_.file.contains("__graft_bucket=")),
      s"post-flat-evolution files must not bucket-route: ${flatNew.map(_.file)}")
    assert(spark.table(s"$cat.lake.evo_flat").count() == 200L)
    // converge flat, then evolve AGAIN to a new bucketing — ids are
    // monotone, never reused
    val id2 = spark.sql(
      s"CALL $cat.system.set_bucketing('lake.evo_flat', 'k', 4)").head.getLong(0)
    assert(id2 == 2L, s"spec ids must be monotone (got $id2)")
    spark.sql(s"CALL $cat.system.optimize('lake.evo_flat', ${1L << 30})")
    val conv = latestRows("evo_flat")
    assert(conv.map(_.spec).toSet == Set(2L) &&
      conv.forall(_.file.contains("__graft_bucket=")),
      s"OPTIMIZE must converge the layout to the current spec: $conv")
    assert(spark.table(s"$cat.lake.evo_flat").count() == 200L)
  }

  test("bucket evolution: refusal matrix — MoR, unknown/non-BIGINT column, no-op") {
    ensure()
    def refusal(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.evo_mor")
    spark.sql(
      s"""CREATE TABLE $cat.lake.evo_mor (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    assert(refusal(s"CALL $cat.system.set_bucketing('lake.evo_mor', 'k', 4)")
      .contains("merge-on-read"))
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.evo_ref")
    spark.sql(s"CREATE TABLE $cat.lake.evo_ref (k BIGINT, s STRING)")
    assert(refusal(s"CALL $cat.system.set_bucketing('lake.evo_ref', 'nope', 4)")
      .contains("not in the table schema"))
    assert(refusal(s"CALL $cat.system.set_bucketing('lake.evo_ref', 's', 4)")
      .contains("must be BIGINT"))
    assert(refusal(s"CALL $cat.system.set_bucketing('lake.evo_ref', 'none', 0)")
      .contains("already has this spec"))
  }

  test("cdf: an idle getOffset never regresses below the startingVersion floor") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.cdf_floor")
    spark.sql(s"CREATE TABLE $cat.lake.cdf_floor (k BIGINT, v DOUBLE)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.cdf_floor VALUES ($i, $i.0)"))
    val src = new org.apache.spark.sql.graft.GraftCdfSource(spark,
      manBase("cdf_floor"), "k", spark.table(s"$cat.lake.cdf_floor").schema,
      startingVersion = Some(5L), dirOpt = Some(tableDir("cdf_floor")),
      catalogTable = Some(s"$cat.lake.cdf_floor"))
    // only v1..v3 exist; the floor (startingVersion-1 = 4) must hold —
    // the old clamp reported min(4, last=3) = 3, the engine recorded
    // offset 3, and the next batch (start=3) re-delivered v4 even
    // though the user asked to start at v5
    val idle = src.getOffset.get.json().trim.toLong
    assert(idle == 4L, s"idle offset must stay at the floor 4, got $idle")
    (4 to 5).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.cdf_floor VALUES ($i, $i.0)"))
    val end = src.getOffset.get.json().trim.toLong
    assert(end == 5L, s"catch-up offset must reach the head, got $end")
    // with the floor held, the engine's range is (4, 5] — exactly v5;
    // the per-step derivation for v5 is sane (insert-tagged, 1 row)
    val v5 = src.changesOf(5L)
      .select("_change_type", "_commit_version").collect()
    assert(v5.length == 1 && v5.head.getString(0) == "insert" &&
      v5.head.getLong(1) == 5L)
  }

  test("cdf: an equality-MoR table refuses a stream key that is not its MoR key") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.cdf_keypin")
    spark.sql(
      s"""CREATE TABLE $cat.lake.cdf_keypin (k BIGINT NOT NULL, v BIGINT)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.cdf_keypin VALUES (1, 10)")
    val schema = spark.table(s"$cat.lake.cdf_keypin").schema
    // a different unique column would read the deletes_ files against
    // an absent column and silently drop every delete mask
    val err = intercept[IllegalArgumentException] {
      new org.apache.spark.sql.graft.GraftCdfSource(spark,
        manBase("cdf_keypin"), "v", schema,
        startingVersion = None, dirOpt = Some(tableDir("cdf_keypin")),
        catalogTable = Some(s"$cat.lake.cdf_keypin"))
    }
    assert(err.getMessage.contains("merge-on-read"), err.getMessage)
    // the table's own key constructs fine
    new org.apache.spark.sql.graft.GraftCdfSource(spark,
      manBase("cdf_keypin"), "k", schema,
      startingVersion = None, dirOpt = Some(tableDir("cdf_keypin")),
      catalogTable = Some(s"$cat.lake.cdf_keypin"))
  }

  test("catalog txn: hand data through begin/DML/commit — one version boundary, " +
      "zero-copy carry, rewrite of a carried file") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_hand")
    spark.sql(s"CREATE TABLE $cat.lake.txn_hand (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.txn_hand VALUES (1,'a'),(2,'b'),(3,'c')")
    val baseRows = latestRows("txn_hand")
    val opened = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_hand')").head
    val (txn, baseV) = (opened.getString(0), opened.getLong(1))
    assert(baseV == 1L)
    // the seed is BY REFERENCE: the workspace manifest points out of
    // its own dir, and no data file was copied anywhere
    val txnLeaf = txn.split('.').last
    val seeded = latestRows(txnLeaf)
    assert(seeded.nonEmpty && seeded.forall(_.file.startsWith("../txn_hand/")),
      s"workspace must carry the base snapshot by reference: $seeded")
    // three statements: insert, delete, and a rewrite that touches a
    // CARRIED (../-referenced) file
    spark.sql(s"INSERT INTO $cat.$txn VALUES (4,'d'),(5,'e')")
    spark.sql(s"DELETE FROM $cat.$txn WHERE k = 2")
    spark.sql(s"UPDATE $cat.$txn SET v = 'Z' WHERE k = 1")
    // snapshot isolation, both directions
    assert(spark.table(s"$cat.lake.txn_hand").count() == 3L,
      "the source must not see in-flight transaction statements")
    assert(ManifestStore.versions(spark, manBase("txn_hand")) == Seq(1L))
    val committed = spark.sql(
      s"CALL $cat.system.commit_txn('lake.txn_hand', '$txn')").head
    assert(committed.getLong(0) == 2L,
      "three statements must publish as exactly one version")
    val got = spark.table(s"$cat.lake.txn_hand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "Z"), (3L, "c"), (4L, "d"), (5L, "e")))
    assert(ManifestStore.versions(spark, manBase("txn_hand")) == Seq(1L, 2L))
    assert(!spark.catalog.tableExists(s"$cat.$txn"),
      "commit must drop the workspace")
    // untouched base files carried into v2 VERBATIM (same rel path)
    val v2 = latestRows("txn_hand").map(_.file).toSet
    val untouched = baseRows.map(_.file).filter(v2.contains)
    assert(untouched.nonEmpty, "some base file should carry by reference")
  }

  test("catalog txn: a concurrent source commit ABORTS the transaction; " +
      "abort_txn discards the workspace") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_conflict")
    spark.sql(s"CREATE TABLE $cat.lake.txn_conflict (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_conflict SELECT id, id*1.0 FROM range(0, 10)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_conflict')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$txn VALUES (100, 1.0)")
    // a RACING writer commits on the source after the txn began
    spark.sql(s"INSERT INTO $cat.lake.txn_conflict VALUES (200, 2.0)")
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_conflict', '$txn')").collect()
    }
    assert(err.getMessage.contains("moved to"), err.getMessage)
    // the source carries ONLY the racer's effect; the txn's must not leak
    assert(spark.table(s"$cat.lake.txn_conflict").count() == 11L)
    spark.sql(s"CALL $cat.system.abort_txn('$txn')").collect()
    assert(!spark.catalog.tableExists(s"$cat.$txn"))
    assert(spark.table(s"$cat.lake.txn_conflict").count() == 11L,
      "abort must leave the source untouched")
  }

  test("catalog txn: refusal matrix — nesting, wrong source, non-flat tables, " +
      "non-workspace abort") {
    ensure()
    def refusal(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_ref")
    spark.sql(s"CREATE TABLE $cat.lake.txn_ref (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_ref VALUES (1, 1.0)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_ref')").head.getString(0)
    assert(refusal(s"CALL $cat.system.begin_txn('$txn')").contains("do not nest"))
    // committing onto a table the workspace was not opened on refuses
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_other")
    spark.sql(s"CREATE TABLE $cat.lake.txn_other (k BIGINT, v DOUBLE)")
    assert(refusal(s"CALL $cat.system.commit_txn('lake.txn_other', '$txn')")
      .contains("was opened on"))
    spark.sql(s"CALL $cat.system.abort_txn('$txn')").collect()
    // non-flat sources refuse
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_mor")
    spark.sql(
      s"""CREATE TABLE $cat.lake.txn_mor (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    // v2 (K52) widened the scope to bucketed tables and v3 (K60, r14)
    // to EQUALITY-delete MoR tables — only POSITION-delete tables
    // still refuse (their delete files address data by path, which a
    // carried reference renames); the eq-MoR begin must now SUCCEED
    val morWs = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_mor')").head.getString(0)
    spark.sql(s"CALL $cat.system.abort_txn('$morWs')").collect()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_pos_ref")
    spark.sql(
      s"""CREATE TABLE $cat.lake.txn_pos_ref (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.mode'='position')""".stripMargin)
    assert(refusal(s"CALL $cat.system.begin_txn('lake.txn_pos_ref')")
      .contains("position-delete"))
    // aborting a non-workspace table refuses
    assert(refusal(s"CALL $cat.system.abort_txn('lake.txn_ref')")
      .contains("not a transaction workspace"))
  }

  test("catalog txn: drop-and-recreate of the source cannot pass the base pin " +
      "(snapshot identity, not version number)") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_ident")
    spark.sql(s"CREATE TABLE $cat.lake.txn_ident (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_ident VALUES (1, 1.0)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_ident')").head.getString(0)
    // the adversary: drop + recreate lands the history back on v1 with
    // the SAME version number but different files
    spark.sql(s"DROP TABLE $cat.lake.txn_ident")
    spark.sql(s"CREATE TABLE $cat.lake.txn_ident (k BIGINT, v DOUBLE)")
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $cat.lake.txn_ident VALUES (9, 9.0)")
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_ident', '$txn')").collect()
    }
    assert(err.getMessage.contains("dropped and recreated") ||
      err.getMessage.contains("commit instant"), err.getMessage)
    // the recreated table is untouched and fully readable
    assert(spark.table(s"$cat.lake.txn_ident")
      .collect().map(_.getLong(0)).toSet == Set(9L))
    spark.sql(s"CALL $cat.system.abort_txn('$txn')").collect()
  }

  test("catalog txn: a workspace with no seeded manifest refuses commit instead " +
      "of wiping the source") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_seedless")
    spark.sql(s"CREATE TABLE $cat.lake.txn_seedless (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_seedless VALUES (1, 1.0), (2, 2.0)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_seedless')").head.getString(0)
    // simulate an interrupted begin: the seeded manifest vanishes
    val txnLeaf = txn.split('.').last
    val fs = new Path(tableDir(txnLeaf))
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(tableDir(txnLeaf), "manifest"), true)
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_seedless', '$txn')").collect()
    }
    assert(err.getMessage.contains("no seeded manifest"), err.getMessage)
    assert(spark.table(s"$cat.lake.txn_seedless").count() == 2L,
      "the refusal must leave the source intact")
    spark.sql(s"CALL $cat.system.abort_txn('$txn')").collect()
  }

  test("bench load sentinel: probes record beside entries with loadavg and " +
      "roll up median/max/flatness") {
    BenchSentinel.record(spark, "sentinel_spec_a")
    BenchSentinel.record(spark, "sentinel_spec_b")
    val full = BenchSentinel.json
    assert(full.contains("\"calibration\""))
    assert(full.contains("\"sentinel_spec_a\":["))
    assert(full.contains("\"probe_med\":") && full.contains("\"flatness\":"))
    val compact = BenchSentinel.compactJson
    assert(compact.startsWith(",\"calib\":{") && compact.contains("\"load_max\":"))
    // the channel parses as JSON when spliced into an object tail
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{\"x\":1" + full + "}")
    val cal = node.get("calibration")
    assert(cal.get("probe_med").asDouble() > 0.0)
    assert(cal.get("flatness").asDouble() >= 1.0)
  }
}
