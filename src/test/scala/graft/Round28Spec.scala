package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftLakeTable

import graft.sinks.ManifestStore

/** Round-14 specs: MV rollup rewrite (Q55), MoR transactions (K60),
  * delete-mass-adjusted stats (K58), DATE histograms (K59), the
  * VACUUM ref floor and journal sweep, and the r14 ADVICE guards.
  */
class Round28Spec extends SparkSpec {

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

  /** Root paths of every file-source leaf in the OPTIMIZED plan — what
    * the MV substitution assertions read (the oracle only sees values).
    */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }

  // ---------------------------------------------------------------
  // Q55: MV rollup rewrite
  // ---------------------------------------------------------------

  test("mv rollup: a monthly consumer is answered from the daily MV's " +
      "files via re-aggregation; parity with the flag off; a " +
      "non-decomposable consumer stays on the base table") {
    import org.apache.spark.sql.graft.MvRewrite
    MvRewrite.ensure(spark)
    val base = java.nio.file.Files.createTempDirectory("graft_mvroll").toString
    spark.range(0, 2000)
      .selectExpr("date_add(DATE'2024-01-01', cast(id % 90 AS INT)) AS day",
        "cast(id % 37 AS DOUBLE) AS price")
      .write.parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val daily = fact.groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum("price").as("t"), max("price").as("mx"))
    MvRewrite.register(spark, "spec_daily", daily, s"$base/mv")
    def monthly = fact
      .groupBy(date_format(col("day"), "yyyy-MM").as("m"))
      .agg(count(lit(1)).as("n"), sum("price").as("t"), max("price").as("mx"))
    val expected = monthly.orderBy("m").collect().toSeq // flag off: base table
    val flag = "spark.graft.mvRewrite"
    spark.conf.set(flag, "true")
    try {
      val served = monthly.orderBy("m")
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("/mv")),
        s"rollup did not substitute the MV (scans: $paths)")
      assert(!paths.exists(_.contains("/fact")),
        s"rollup still scans the base table (scans: $paths)")
      assert(served.collect().toSeq == expected)
      // count returned as re-aggregated sum must still BE a count:
      // exact values, bigint type
      assert(served.schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      // a non-decomposable aggregate (avg) must stay on the base table
      val avgQ = fact.groupBy(date_format(col("day"), "yyyy-MM").as("m"))
        .agg(avg("price").as("a"))
      val avgPaths = scanPaths(avgQ)
      assert(avgPaths.exists(_.contains("/fact")) &&
        !avgPaths.exists(_.contains("/mv")),
        s"avg consumer must not roll up (scans: $avgPaths)")
      // a consumer over a DIFFERENT base must stay untouched
      spark.range(0, 10).selectExpr("DATE'2024-01-01' AS day",
        "cast(id AS DOUBLE) AS price").write.parquet(s"$base/other")
      val other = spark.read.parquet(s"$base/other")
        .groupBy(date_format(col("day"), "yyyy-MM").as("m"))
        .agg(count(lit(1)).as("n"), sum("price").as("t"), max("price").as("mx"))
      assert(!scanPaths(other).exists(_.contains("/mv")))
    } finally {
      spark.conf.unset(flag)
      MvRewrite.clear(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("mv rollup: avg decomposes through a view carrying its sum+count " +
      "pair, exactly, all-null groups included") {
    import org.apache.spark.sql.graft.MvRewrite
    MvRewrite.ensure(spark)
    val base = java.nio.file.Files.createTempDirectory("graft_mvavg").toString
    // group 9's x is ALWAYS null — its avg must stay null through the
    // rollup (Σcounts = 0 → legacy divide → null, never an ANSI error)
    spark.range(0, 1000)
      .selectExpr("id % 10 AS g",
        "CASE WHEN id % 10 = 9 THEN CAST(NULL AS DOUBLE) ELSE cast(id AS DOUBLE) END AS x",
        "id % 4 AS sub")
      .write.parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val mv = fact.groupBy(col("g"), col("sub"))
      .agg(sum("x").as("sx"), count(col("x")).as("cx"))
    MvRewrite.register(spark, "spec_avg", mv, s"$base/mv")
    def consumer = fact.groupBy(col("g")).agg(avg("x").as("a"))
    val expected = consumer.orderBy("g").collect().toSeq // flag off
    spark.conf.set("spark.graft.mvRewrite", "true")
    try {
      val served = consumer.orderBy("g")
      assert(scanPaths(served).exists(_.contains("/mv")),
        s"avg must roll up through the sum+count pair: ${scanPaths(served)}")
      val got = served.collect().toSeq
      assert(got == expected, s"avg rollup parity broke:\n$got\nvs\n$expected")
      // a view with count(*) but NOT count(x) must refuse avg(x)
      MvRewrite.clear(spark)
      val mvStar = fact.groupBy(col("g"), col("sub"))
        .agg(sum("x").as("sx"), count(lit(1)).as("c1"))
      MvRewrite.register(spark, "spec_avg2", mvStar, s"$base/mv2")
      assert(scanPaths(consumer).exists(_.contains("/fact")),
        "count(*) is not count(x): avg must stay on the base table")
    } finally {
      spark.conf.unset("spark.graft.mvRewrite")
      MvRewrite.clear(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("mv rollup: the identical-grain consumer still takes the exact-match " +
      "path and distinct aggregates never decompose") {
    import org.apache.spark.sql.graft.MvRewrite
    MvRewrite.ensure(spark)
    val base = java.nio.file.Files.createTempDirectory("graft_mvroll2").toString
    spark.range(0, 500)
      .selectExpr("cast(id % 7 AS BIGINT) AS g", "cast(id AS DOUBLE) AS x")
      .write.parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val mv = fact.groupBy(col("g")).agg(count(lit(1)).as("n"), sum("x").as("t"))
    MvRewrite.register(spark, "spec_g", mv, s"$base/mv")
    spark.conf.set("spark.graft.mvRewrite", "true")
    try {
      // same grain: served from the MV (exact match)
      assert(scanPaths(mv.orderBy("g")).exists(_.contains("/mv")))
      // distinct: must NOT decompose through the rollup
      val d = fact.groupBy(col("g")).agg(countDistinct(col("x")).as("nd"))
      assert(scanPaths(d).exists(_.contains("/fact")))
      // coarser grain over the SAME base: count+sum roll up (g % 2)
      val coarse = fact.groupBy((col("g") % 2).as("g2"))
        .agg(count(lit(1)).as("n"), sum("x").as("t"))
      val expected = {
        spark.conf.set("spark.graft.mvRewrite", "false")
        try coarse.orderBy("g2").collect().toSeq
        finally spark.conf.set("spark.graft.mvRewrite", "true")
      }
      assert(scanPaths(coarse).exists(_.contains("/mv")))
      assert(coarse.orderBy("g2").collect().toSeq == expected)
    } finally {
      spark.conf.unset("spark.graft.mvRewrite")
      MvRewrite.clear(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  // ---------------------------------------------------------------
  // K60: transactions on equality-delete MoR tables
  // ---------------------------------------------------------------

  test("MoR transaction: intra-txn delete-after-insert is preserved " +
      "(statement replay, not squash) with statement-granular versions") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.mor_txn_spec")
    spark.sql(
      s"""CREATE TABLE $cat.lake.mor_txn_spec (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.mor_txn_spec VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val opened = spark.sql(
      s"CALL $cat.system.begin_txn('lake.mor_txn_spec')").head
    val (ws, baseV) = (opened.getString(0), opened.getLong(1))
    assert(baseV == 1L)
    spark.sql(s"INSERT INTO $cat.$ws VALUES (10, 10.0)")
    // deletes BOTH a base row (k=1, seq 1) and the fresh insert
    // (k=10, seq 2) — a squash onto one seq would resurrect k=10
    spark.sql(s"DELETE FROM $cat.$ws WHERE k IN (1, 10)")
    val committed = spark.sql(
      s"CALL $cat.system.commit_txn('lake.mor_txn_spec', '$ws')").head
    assert(committed.getLong(0) == 3L, s"expected v3, got $committed")
    val got = spark.table(s"$cat.lake.mor_txn_spec")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L), s"delete-after-insert broke: $got")
    // statement granularity: v2 (the insert) is time-travel-addressable
    val atV2 = spark.sql(
      s"SELECT k FROM $cat.lake.mor_txn_spec VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(atV2 == Seq(1L, 2L, 3L, 10L), s"v2 snapshot wrong: $atV2")
    assert(ManifestStore.versions(spark, manBase("mor_txn_spec")) ==
      Seq(1L, 2L, 3L))
  }

  test("MoR transaction: the workspace's masked read carries the source's " +
      "live delete files (a carried delete file must keep masking)") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.mor_txn_carry")
    spark.sql(
      s"""CREATE TABLE $cat.lake.mor_txn_carry (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.mor_txn_carry " +
      "SELECT id, id * 1.0 FROM range(1, 7)")
    spark.sql(s"DELETE FROM $cat.lake.mor_txn_carry WHERE k % 2 = 0")
    val ws = spark.sql(
      s"CALL $cat.system.begin_txn('lake.mor_txn_carry')").head.getString(0)
    val wsKeys = spark.table(s"$cat.$ws").collect().map(_.getLong(0)).sorted.toSeq
    assert(wsKeys == Seq(1L, 3L, 5L),
      s"carried delete file not applied in the workspace: $wsKeys")
    spark.sql(s"CALL $cat.system.abort_txn('$ws')").collect()
  }

  test("transactions on spec-evolved tables: carried rows keep their " +
      "per-file spec, fresh rows stamp the current one, and a racing " +
      "set_bucketing aborts the commit through the meta pin") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_evo_spec")
    spark.sql(
      s"""CREATE TABLE $cat.lake.txn_evo_spec (k BIGINT NOT NULL, v DOUBLE)
         |PARTITIONED BY (bucket(2, k))""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.txn_evo_spec " +
      "SELECT id * 2, id * 1.0 FROM range(0, 10)")
    val sid = spark.sql(
      s"CALL $cat.system.set_bucketing('lake.txn_evo_spec', 'k', 4)")
      .head.getLong(0)
    spark.sql(s"INSERT INTO $cat.lake.txn_evo_spec " +
      "SELECT id * 2 + 1, id * 1.0 FROM range(0, 10)")
    val ws = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_evo_spec')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$ws VALUES (100, 100.0)")
    // stats-prunable DML: k > 50 provably misses every base file
    // (their key stats top out at 19), so the pre-evolution files
    // CARRY — which is exactly what the spec-preservation law needs
    // to observe (a whole-range DML would legitimately rewrite every
    // file under the current spec)
    spark.sql(s"UPDATE $cat.$ws SET v = v + 1 WHERE k > 50")
    val commitV = spark.sql(
      s"CALL $cat.system.commit_txn('lake.txn_evo_spec', '$ws')").head.getLong(0)
    val rows = latestRows("txn_evo_spec")
    assert(rows.filter(_.seq < commitV).map(_.spec).toSet == Set(0L, sid),
      "carried files must keep both layout generations' spec tags")
    assert(rows.filter(_.seq == commitV).map(_.spec).toSet == Set(sid),
      "transaction-fresh files must stamp the current spec")
    val got = spark.table(s"$cat.lake.txn_evo_spec")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.last == ((100L, 101.0)), s"txn UPDATE lost: ${got.last}")
    assert(got.map(_._1).toSeq == ((0L to 19L) :+ 100L),
      s"content through the evolved txn broke: ${got.toSeq}")
    // a set_bucketing racing an OPEN transaction must abort its commit
    val ws2 = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_evo_spec')").head.getString(0)
    spark.sql(s"INSERT INTO $cat.$ws2 VALUES (200, 200.0)")
    spark.sql(s"CALL $cat.system.set_bucketing('lake.txn_evo_spec', 'k', 8)")
      .collect()
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.commit_txn('lake.txn_evo_spec', '$ws2')")
        .collect()
    }
    assert(e.getMessage.contains("schema changed"), e.getMessage)
    spark.sql(s"CALL $cat.system.abort_txn('$ws2')").collect()
    assert(!spark.table(s"$cat.lake.txn_evo_spec")
      .collect().map(_.getLong(0)).contains(200L))
  }

  test("transaction workspaces refuse meta edits: set_bucketing and ALTER " +
      "on a workspace would bypass the source meta pin") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.txn_meta_guard")
    spark.sql(s"CREATE TABLE $cat.lake.txn_meta_guard (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.txn_meta_guard VALUES (1, 1.0)")
    val ws = spark.sql(
      s"CALL $cat.system.begin_txn('lake.txn_meta_guard')").head.getString(0)
    try {
      val e1 = intercept[Exception] {
        spark.sql(s"CALL $cat.system.set_bucketing('$ws', 'k', 4)").collect()
      }
      assert(e1.getMessage.contains("workspaces refuse meta edits"),
        e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.$ws ADD COLUMN extra DOUBLE").collect()
      }
      assert(e2.getMessage.contains("transaction workspace"), e2.getMessage)
    } finally spark.sql(s"CALL $cat.system.abort_txn('$ws')").collect()
  }

  test("begin_txn refuses position-delete MoR tables, naming the " +
      "path-identity hazard") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.mor_txn_pos")
    spark.sql(
      s"""CREATE TABLE $cat.lake.mor_txn_pos (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.mode'='position')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.mor_txn_pos VALUES (1, 1.0)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.begin_txn('lake.mor_txn_pos')").collect()
    }
    assert(e.getMessage.contains("position-delete"), e.getMessage)
  }

  // ---------------------------------------------------------------
  // K58: delete-mass-adjusted scan statistics
  // ---------------------------------------------------------------

  test("equality-delete MoR scan stats subtract the distinct delete-key " +
      "mass exactly and scale bytes by the surviving fraction") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.smor_spec")
    spark.sql(
      s"""CREATE TABLE $cat.lake.smor_spec (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.lake.smor_spec " +
      "SELECT id, id * 1.0 FROM range(0, 100)")
    spark.sql(s"DELETE FROM $cat.lake.smor_spec WHERE k % 2 = 0")
    val rawBytes = latestRows("smor_spec")
      .filterNot(r => r.file.startsWith("deletes_")).map(_.bytes).sum
    val st = spark.table(s"$cat.lake.smor_spec")
      .queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          s.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
            .estimateStatistics()
      }.get
    assert(st.numRows.isPresent && st.numRows.getAsLong == 50L,
      s"adjusted rows must be exact: ${st.numRows}")
    val b = st.sizeInBytes.getAsLong
    assert(b > rawBytes / 4 && b < rawBytes * 3 / 4,
      s"bytes must scale by the surviving fraction: $b vs raw $rawBytes")
  }

  test("a PRUNED MoR scan bounds the delete subtraction per file by " +
      "key-range overlap: file-disjoint delete mass subtracts nothing " +
      "from a delete-free file") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.smor_prune")
    spark.sql(
      s"""CREATE TABLE $cat.lake.smor_prune (k BIGINT NOT NULL, v DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    // two commits = two files with disjoint key ranges
    spark.sql(s"INSERT INTO $cat.lake.smor_prune " +
      "SELECT id, id * 1.0 FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.lake.smor_prune " +
      "SELECT id, id * 1.0 FROM range(100, 150)")
    // delete 40 keys, ALL in the first file's range
    spark.sql(s"DELETE FROM $cat.lake.smor_prune WHERE k < 40")
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          s.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
            .estimateStatistics()
      }.get
    // full scan: exact subtraction (100 raw − 40 keys = 60 servable)
    val full = statsOf(spark.table(s"$cat.lake.smor_prune"))
    assert(full.numRows.getAsLong == 60L, s"full: ${full.numRows}")
    // pruned to the delete-free file (50 raw rows): every delete key
    // lies outside its [100,150) key range, so the per-file bound
    // subtracts NOTHING — the exact answer (a table-wide subtraction
    // clamped this to 10, and at higher delete mass to 0 rows /
    // 1 byte — the OOM-broadcast invite; a uniform pro-rate still
    // under-reported file-correlated masks by the pruned fraction)
    val pruned = statsOf(spark.table(s"$cat.lake.smor_prune").where("k >= 100"))
    assert(pruned.numRows.getAsLong == 50L,
      s"delete-free pruned file must keep all its rows: ${pruned.numRows}")
    assert(pruned.sizeInBytes.getAsLong > 1L)
  }

  // ---------------------------------------------------------------
  // K59: DATE histograms feeding FilterEstimation
  // ---------------------------------------------------------------

  test("DATE histogram: a CBO range estimate over a skewed calendar " +
      "tracks the actual instead of the uniform interpolation") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.histod_spec")
    spark.sql(s"CREATE TABLE $cat.lake.histod_spec (d DATE, q DOUBLE)")
    (0 until 2).foreach { half =>
      spark.sql(
        s"""INSERT INTO $cat.lake.histod_spec
           |SELECT CASE WHEN id % 10 = 0
           |  THEN date_add(DATE'2024-01-01', cast(id % 365 AS INT))
           |  ELSE DATE'2024-01-05' END, id * 1.0
           |FROM range(${half * 10000}, ${(half + 1) * 10000})""".stripMargin)
    }
    val actual = spark.sql(
      s"SELECT count(*) FROM $cat.lake.histod_spec WHERE d > DATE'2024-07-01'")
      .head.getLong(0)
    val total = spark.table(s"$cat.lake.histod_spec").count()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val est =
      try spark.table(s"$cat.lake.histod_spec").where("d > DATE'2024-07-01'")
        .queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
      finally spark.conf.set("spark.sql.cbo.enabled", "false")
    assert(actual > 0L && est.isDefined, s"estimate missing (actual $actual)")
    val uniform = total / 2
    assert(est.get < uniform / 3,
      s"estimate ${est.get} did not beat uniform $uniform by 3x")
    assert(est.get <= actual * 3 && est.get >= actual / 3,
      s"estimate ${est.get} not within 3x of actual $actual")
  }

  // ---------------------------------------------------------------
  // VACUUM: ref floor + journal sweep (r14 advice)
  // ---------------------------------------------------------------

  test("vacuum floors retention at the oldest ref-pinned version; " +
      "dropping the ref releases it") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.refv_t")
    spark.sql(s"CREATE TABLE $cat.lake.refv_t (k BIGINT, v DOUBLE)")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO $cat.lake.refv_t VALUES ($i, $i.0)"))
    spark.sql(s"CALL $cat.system.set_ref('lake.refv_t', 'pin', 'tag', 1)").collect()
    spark.sql(s"CALL $cat.system.vacuum('lake.refv_t', 1, 0)").collect()
    // the tag pins v1: every version from the pin up must survive
    assert(ManifestStore.versions(spark, manBase("refv_t")) ==
      Seq(1L, 2L, 3L, 4L))
    val pinned = spark.sql(
      s"SELECT count(*) FROM $cat.lake.refv_t VERSION AS OF 'pin'")
      .head.getLong(0)
    assert(pinned == 1L)
    spark.sql(s"CALL $cat.system.drop_ref('lake.refv_t', 'pin')").collect()
    spark.sql(s"CALL $cat.system.vacuum('lake.refv_t', 1, 0)").collect()
    assert(ManifestStore.versions(spark, manBase("refv_t")) == Seq(4L))
  }

  test("vacuum's journal sweep finalizes a committed claim and retires the " +
      "journal; pre-content (empty) journals are left alone") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.jsweep_t")
    spark.sql(s"CREATE TABLE $cat.lake.jsweep_t (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.jsweep_t VALUES (1, 1.0)")
    val mb = manBase("jsweep_t")
    val txnId = "feedc0ffee14"
    val jdir = new Path(graft.queries.IOQueries.catalogRoot, ".txn_journal")
    val claim = {
      import spark.implicits._
      latestRows("jsweep_t")
        .map(r => (r.file, r.nRows, "", r.stats, 2L, r.bytes, r.spec))
        .toDF("file", "n_rows", "txn", "stats", "seq", "bytes", "spec")
    }
    assert(ManifestStore.tryPublishPending(spark, mb, claim, 2L, txnId,
      jdir.toString))
    // the claim is suppressed until its journal commits
    assert(ManifestStore.versions(spark, mb) == Seq(1L))
    fs.mkdirs(jdir)
    val jp = new Path(jdir, s"committed_$txnId")
    val out = fs.create(jp, false)
    try out.write("lake.jsweep_t".getBytes("UTF-8")) finally out.close()
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(jp, old, -1)
    // a legacy EMPTY journal (no group content) must survive the sweep
    val jpLegacy = new Path(jdir, "committed_legacy000abc")
    fs.create(jpLegacy, false).close()
    fs.setTimes(jpLegacy, old, -1)
    try {
      spark.sql(s"CALL $cat.system.vacuum('lake.jsweep_t', 10, 0)").collect()
      assert(ManifestStore.versions(spark, mb) == Seq(1L, 2L),
        "the committed claim must be finalized visible")
      assert(!fs.exists(jp), "the content-bearing journal must retire")
      assert(fs.exists(jpLegacy), "a pre-content journal must survive")
    } finally fs.delete(jpLegacy, false)
  }
}
