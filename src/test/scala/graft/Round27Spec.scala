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
    // 32-bit String.hashCode pin was not (advice, round 12)
    assert("\"schemaSha\":\"[0-9a-f]{64}\"".r.findFirstIn(markerTxt).isDefined,
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
