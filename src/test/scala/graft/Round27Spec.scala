package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.GraftLakeTable

import graft.sinks.ManifestStore

/** Round-13 specs, batch 1: the four round-12 ADVICE fixes on the
  * transaction/catalog plane — idempotent commit_txn recovery, the
  * SHA-256 schema pin, activity-gated (not dir-mtime-gated) vacuum of
  * transaction workspaces, and meta-safe bucket/merge-key names.
  */
class Round27Spec extends SparkSpec {

  private val cat = "graft"

  private def ensure(): Unit = graft.queries.IOQueries.ensureCatalog(spark)

  private def tableDir(table: String): String =
    graft.queries.IOQueries.catalogRoot + s"/lake/$table"
  private def manBase(table: String): String = tableDir(table) + "/manifest"

  private def fs = new Path(graft.queries.IOQueries.catalogRoot)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def latestRows(table: String): Seq[GraftLakeTable.ManifestRow] = {
    val mb = manBase(table)
    GraftLakeTable.manifestRowsFull(spark, mb,
      ManifestStore.versions(spark, mb).last)
  }

  test("commit_txn is idempotent across a crash between dir moves and the " +
      "publish: a retry completes instead of dying on its own half-moved work") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_idem")
    spark.sql(s"CREATE TABLE $cat.lake.txn_idem (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_idem SELECT id, id*1.0 FROM range(0, 5)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_idem')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$txn VALUES (100, 1.0)")
    spark.sql(s"INSERT INTO $cat.$txn VALUES (200, 2.0)")
    // simulate the crash window: one (but not all) fresh write dirs
    // already moved under the source, exactly what a driver death
    // between the rename loop and the CAS publish leaves behind
    val txnLeaf = txn.split('.').last
    val txnMan = manBase(txnLeaf)
    val rows = GraftLakeTable.manifestRowsFull(spark, txnMan,
      ManifestStore.versions(spark, txnMan).last)
    val freshDirs = rows.filterNot(_.file.startsWith("../"))
      .map(_.file.split('/').head).distinct
    assert(freshDirs.size >= 2, s"need >=2 fresh dirs, got $freshDirs")
    val moved = freshDirs.head
    assert(fs.rename(new Path(tableDir(txnLeaf), moved),
      new Path(tableDir("txn_idem"), moved)))
    // the retried commit must treat source-gone+target-present as
    // already moved and complete the transaction
    spark.sql(s"CALL $cat.system.commit_txn('lake.txn_idem', '$txn')").collect()
    val got = spark.table(s"$cat.lake.txn_idem")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (3L, 3.0),
      (4L, 4.0), (100L, 1.0), (200L, 2.0)))
    // a dir missing from BOTH sides is corruption, named
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_idem2")
    spark.sql(s"CREATE TABLE $cat.lake.txn_idem2 (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_idem2 VALUES (1, 1.0)")
    val txn2 = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_idem2')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$txn2 VALUES (9, 9.0)")
    val txn2Leaf = txn2.split('.').last
    val man2 = manBase(txn2Leaf)
    val fresh2 = GraftLakeTable.manifestRowsFull(spark, man2,
      ManifestStore.versions(spark, man2).last)
      .filterNot(_.file.startsWith("../")).map(_.file.split('/').head).distinct
    fresh2.foreach(d => fs.delete(new Path(tableDir(txn2Leaf), d), true))
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_idem2', '$txn2')").collect()
    }
    assert(err.getMessage.contains("missing from both"), err.getMessage)
    spark.sql(s"CALL $cat.system.abort_txn('$txn2')").collect()
  }

  test("txn marker pins the schema with a full SHA-256 digest, not a 32-bit " +
      "hash; a schema change still refuses at commit") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_sha")
    spark.sql(s"CREATE TABLE $cat.lake.txn_sha (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_sha VALUES (1, 1.0)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_sha')").head.getString(0)
    val txnLeaf = txn.split('.').last
    val markerPath = new Path(tableDir(txnLeaf), "_graft_txn.json")
    val in = fs.open(markerPath)
    val markerTxt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // 64 hex chars = a full SHA-256, the collision-safe identity the
    // 32-bit String.hashCode pin was not (advice, round 12); the pin
    // covers the FULL meta text, so bucketing changes refuse too
    assert("\"metaSha\":\"[0-9a-f]{64}\"".r.findFirstIn(markerTxt).isDefined,
      markerTxt)
    spark.sql(s"ALTER TABLE $cat.lake.txn_sha ADD COLUMN w STRING")
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_sha', '$txn')").collect()
    }
    assert(err.getMessage.contains("schema changed"), err.getMessage)
    spark.sql(s"CALL $cat.system.abort_txn('$txn')").collect()
  }

  test("vacuum judges a transaction workspace stale by LAST ACTIVITY (marker " +
      "+ newest manifest version), not by directory mtime") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_idle")
    spark.sql(s"CREATE TABLE $cat.lake.txn_idle (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_idle VALUES (1, 1.0)")
    val txn = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_idle')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$txn VALUES (2, 2.0)")
    val txnLeaf = txn.split('.').last
    val wsDir = new Path(tableDir(txnLeaf))
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    // a >24h-old WORKSPACE whose latest statement is recent: backdate
    // the dir and the begin marker, leave the manifest versions fresh
    fs.setTimes(wsDir, old, old)
    fs.setTimes(new Path(wsDir, "_graft_txn.json"), old, old)
    spark.sql(s"CALL $cat.system.vacuum('lake.txn_idle', 10, 0)").collect()
    assert(fs.exists(new Path(wsDir, "_graft_txn.json")),
      "a live long-running transaction must not be swept")
    spark.sql(s"INSERT INTO $cat.$txn VALUES (3, 3.0)")
    spark.sql(s"CALL $cat.system.commit_txn('lake.txn_idle', '$txn')").collect()
    assert(spark.table(s"$cat.lake.txn_idle").count() == 3L)
    // a workspace with NO activity inside the window sweeps: backdate
    // everything, including every manifest version file
    val txn2 = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_idle')").head.getString(0)
    val ws2 = new Path(tableDir(txn2.split('.').last))
    fs.setTimes(ws2, old, old)
    fs.setTimes(new Path(ws2, "_graft_txn.json"), old, old)
    fs.listStatus(new Path(ws2, "manifest"))
      .foreach(st => fs.setTimes(st.getPath, old, old))
    spark.sql(s"CALL $cat.system.vacuum('lake.txn_idle', 10, 0)").collect()
    assert(!fs.exists(ws2), "an abandoned workspace must sweep")
  }

  test("K52 group txn: a two-table transaction (one flat, one bucketed) " +
      "commits atomically — both tables flip at one journal point") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_a")
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_b")
    spark.sql(s"CREATE TABLE $cat.lake.grp_a (k BIGINT, v STRING)")
    spark.sql(
      s"""CREATE TABLE $cat.lake.grp_b (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.grp_a VALUES (1,'a'),(2,'b')")
    spark.sql(s"INSERT INTO $cat.lake.grp_b SELECT id, id*1.0 FROM range(0, 20)")
    val opened = spark.sql(
      s"CALL $cat.system.begin_txn('lake.grp_a,lake.grp_b')").collect()
    assert(opened.length == 2)
    val wss = opened.map(_.getString(0))
    val (wsA, wsB) = (wss.find(_.contains("grp_a")).get,
      wss.find(_.contains("grp_b")).get)
    // the workspaces share ONE transaction id
    assert(wsA.split("__txn_").last == wsB.split("__txn_").last)
    spark.sql(s"INSERT INTO $cat.$wsA VALUES (3,'c')")
    spark.sql(s"DELETE FROM $cat.$wsB WHERE k >= 10")
    spark.sql(s"INSERT INTO $cat.$wsB VALUES (100, 100.0)")
    // isolation: neither source sees anything yet
    assert(spark.table(s"$cat.lake.grp_a").count() == 2L)
    assert(spark.table(s"$cat.lake.grp_b").count() == 20L)
    val out = spark.sql(
      s"CALL $cat.system.commit_txn('lake.grp_a,lake.grp_b', '$wsA,$wsB')")
      .collect()
    assert(out.length == 2 && out.forall(_.getLong(0) == 2L))
    assert(spark.table(s"$cat.lake.grp_a").count() == 3L)
    val bRows = spark.table(s"$cat.lake.grp_b")
      .collect().map(_.getLong(0)).sorted
    assert(bRows.toSeq == ((0L until 10L) :+ 100L))
    // the bucketed table still reads storage-partitioned after the txn
    // (carried refs keep their __graft_bucket path component)
    assert(!spark.catalog.tableExists(s"$cat.$wsA"))
    assert(!spark.catalog.tableExists(s"$cat.$wsB"))
    // committing a STRICT SUBSET of a group refuses
    val opened2 = spark.sql(
      s"CALL $cat.system.begin_txn('lake.grp_a,lake.grp_b')").collect()
    val ws2A = opened2.map(_.getString(0)).find(_.contains("grp_a")).get
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.grp_a', '$ws2A')").collect()
    }
    assert(err.getMessage.contains("commit together"), err.getMessage)
    spark.sql(s"CALL $cat.system.abort_txn('${opened2.map(_.getString(0)).mkString(",")}')")
      .collect()
  }

  test("K52 group txn: a racer on ONE table aborts the WHOLE group — " +
      "no table shows a partial effect, and no claim leaks") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_c")
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_d")
    spark.sql(s"CREATE TABLE $cat.lake.grp_c (k BIGINT, v DOUBLE)")
    spark.sql(s"CREATE TABLE $cat.lake.grp_d (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.grp_c VALUES (1, 1.0)")
    spark.sql(s"INSERT INTO $cat.lake.grp_d VALUES (1, 1.0)")
    val wss = spark.sql(
      s"CALL $cat.system.begin_txn('lake.grp_c,lake.grp_d')")
      .collect().map(_.getString(0))
    wss.foreach(ws => spark.sql(s"INSERT INTO $cat.$ws VALUES (9, 9.0)"))
    // racer lands on grp_d only
    spark.sql(s"INSERT INTO $cat.lake.grp_d VALUES (2, 2.0)")
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.grp_c,lake.grp_d', " +
        s"'${wss.mkString(",")}')").collect()
    }
    assert(err.getMessage.contains("moved to"), err.getMessage)
    // NEITHER table shows the transaction's effect
    assert(spark.table(s"$cat.lake.grp_c").count() == 1L)
    assert(spark.table(s"$cat.lake.grp_d").count() == 2L)
    // and later writes proceed normally (no suppressed claim wedges
    // the version counter)
    spark.sql(s"INSERT INTO $cat.lake.grp_c VALUES (3, 3.0)")
    assert(spark.table(s"$cat.lake.grp_c").count() == 2L)
  }

  test("K52 pending-claim law: a claimed version is invisible to readers and " +
      "blocks CAS writers until the journal commit point; abort rolls it back") {
    ensure()
    import org.apache.spark.sql.functions.lit
    val base = graft.queries.IOQueries.catalogRoot + "/lake/pend_t/manifest"
    val journal = graft.queries.IOQueries.catalogRoot + "/lake/.test_journal"
    def mf(tag: String) = spark.range(1)
      .select(lit(s"data_x/$tag.parquet").as("file"), lit(1L).as("n_rows"),
        lit("").as("txn"))
    assert(ManifestStore.tryPublish(spark, base, mf("v1"), 1L))
    // phase-1 claim at v2
    assert(ManifestStore.tryPublishPending(spark, base, mf("v2"), 2L, "aa11", journal))
    assert(ManifestStore.versions(spark, base) == Seq(1L),
      "a pending claim must be invisible")
    // a CAS writer targeting v2 blocks (fails), never silently skips past
    assert(!ManifestStore.tryPublish(spark, base, mf("other"), 2L))
    assert(ManifestStore.versions(spark, base) == Seq(1L))
    // commit point: one journal file flips it visible
    fs.mkdirs(new Path(journal))
    fs.create(new Path(journal, "committed_aa11"), false).close()
    assert(ManifestStore.versions(spark, base) == Seq(1L, 2L))
    // the first resolving read finalized the claim: marker + crumb gone
    assert(!fs.exists(new Path(base, "manifest_v2/_pending_aa11")))
    assert(!fs.exists(new Path(base, "pending_v2_aa11")))
    // an aborted claim rolls back completely and frees the number
    assert(ManifestStore.tryPublishPending(spark, base, mf("v3"), 3L, "bb22", journal))
    assert(ManifestStore.versions(spark, base) == Seq(1L, 2L))
    ManifestStore.abortPending(spark, base, 3L, "bb22")
    assert(ManifestStore.versions(spark, base) == Seq(1L, 2L))
    assert(ManifestStore.tryPublish(spark, base, mf("v3b"), 3L),
      "an aborted claim must free its version number")
    assert(ManifestStore.versions(spark, base) == Seq(1L, 2L, 3L))
  }

  test("K52 crash recovery: a committed-journal retry finalizes; vacuum " +
      "rolls back an abandoned uncommitted claim after the grace window") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_e")
    spark.sql(s"CREATE TABLE $cat.lake.grp_e (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.grp_e VALUES (1, 1.0)")
    // an abandoned phase-1 claim (txn died before its commit point)
    import org.apache.spark.sql.functions.lit
    val mb = manBase("grp_e")
    val journal = graft.queries.IOQueries.catalogRoot + "/.txn_journal"
    val ghost = spark.range(1)
      .select(lit("data_ghost/g.parquet").as("file"), lit(1L).as("n_rows"),
        lit("").as("txn"))
    assert(ManifestStore.tryPublishPending(spark, mb, ghost, 2L, "cc33", journal))
    assert(spark.table(s"$cat.lake.grp_e").count() == 1L,
      "the abandoned claim must stay invisible")
    // fresh claim: vacuum must NOT roll it back (grace window)
    spark.sql(s"CALL $cat.system.vacuum('lake.grp_e', 10, 0)").collect()
    assert(fs.exists(new Path(mb, "manifest_v2/_pending_cc33")))
    // age it past the staging window -> vacuum rolls it back
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(new Path(mb, "manifest_v2"), old, old)
    spark.sql(s"CALL $cat.system.vacuum('lake.grp_e', 10, 0)").collect()
    assert(!fs.exists(new Path(mb, "manifest_v2")),
      "vacuum must roll back an aged uncommitted claim")
    // the freed number is writable again
    spark.sql(s"INSERT INTO $cat.lake.grp_e VALUES (2, 2.0)")
    assert(spark.table(s"$cat.lake.grp_e").count() == 2L)
  }

  test("K52 bucketed txn: DML in a bucketed workspace routes buckets, and " +
      "a bucketing change on the source refuses at commit") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grp_bk")
    spark.sql(
      s"""CREATE TABLE $cat.lake.grp_bk (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.grp_bk SELECT id, id*1.0 FROM range(0, 16)")
    val ws = spark.sql(
      s"CALL $cat.system.begin_txn('lake.grp_bk')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$ws VALUES (100, 1.0)")
    // the workspace write routed through the bucket layout
    val wsLeaf = ws.split('.').last
    val freshFiles = latestRows(wsLeaf).filterNot(_.file.startsWith("../"))
    assert(freshFiles.nonEmpty &&
      freshFiles.forall(_.file.contains("__graft_bucket=")),
      freshFiles.map(_.file).mkString(", "))
    // a concurrent set_bucketing on the source is a meta change: refuse
    spark.sql(s"CALL $cat.system.set_bucketing('lake.grp_bk', 'none', 0)").collect()
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.grp_bk', '$ws')").collect()
    }
    assert(err.getMessage.contains("schema changed"), err.getMessage)
    spark.sql(s"CALL $cat.system.abort_txn('$ws')").collect()
    assert(spark.table(s"$cat.lake.grp_bk").count() == 16L)
  }

  test("bucket/merge-key names that would corrupt the meta-file JSON wrapper " +
      "refuse by name; the existing meta stays intact") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.meta_safe")
    spark.sql(s"""CREATE TABLE $cat.lake.meta_safe (`k"q` BIGINT, v DOUBLE)""")
    spark.sql(s"INSERT INTO $cat.lake.meta_safe VALUES (1, 1.0)")
    val err = intercept[Exception] {
      spark.sql(
        s"""CALL $cat.system.set_bucketing('lake.meta_safe', 'k"q', 4)""").collect()
    }
    assert(err.getMessage.contains("not representable"), err.getMessage)
    // the refusal must leave the table fully readable (no torn meta)
    assert(spark.table(s"$cat.lake.meta_safe").count() == 1L)
    // the CREATE-time bucket transform path refuses the same way
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.meta_safe2")
    val err2 = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.lake.meta_safe2 (`a"b` BIGINT, v DOUBLE)
           |PARTITIONED BY (bucket(4, `a"b`))""".stripMargin)
    }
    assert(err2.getMessage.contains("not representable"), err2.getMessage)
    // and so does the CREATE-time merge-on-read key
    val err3 = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.lake.meta_safe2 (`a"b` BIGINT NOT NULL, v DOUBLE)
           |TBLPROPERTIES('graft.merge-on-read.key'='a"b')""".stripMargin)
    }
    assert(err3.getMessage.contains("not representable"), err3.getMessage)
  }
}
