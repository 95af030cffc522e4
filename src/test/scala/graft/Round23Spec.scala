package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sinks.{ManifestStore, RefStore}

/** Round-10 batch-3 specs: the manifest-lake ref system (K38) — the
  * contracts a DataFrame-level oracle can't see: tag immutability
  * (the move must THROW), branch isolation on hand data, and the CAS
  * loop surviving a LIVE two-writer ref race without a lost update.
  */
class Round23Spec extends SparkSpec {

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_refspec").toString

  test("refstore: tags are immutable — re-pointing throws, re-asserting is a no-op") {
    val refs = freshBase() + "/refs"
    RefStore.set(spark, refs, "rel", "tag", 5L)
    RefStore.set(spark, refs, "rel", "tag", 5L) // same version: allowed
    assert(RefStore.resolve(spark, refs, "rel") == ("tag", 5L))
    intercept[IllegalStateException] {
      RefStore.set(spark, refs, "rel", "tag", 6L)
    }
    assert(RefStore.resolve(spark, refs, "rel") == ("tag", 5L),
      "a refused move must leave the tag untouched")
    intercept[IllegalArgumentException] {
      RefStore.set(spark, refs, "rel", "branch", 7L) // kind change refused
    }
  }

  test("refstore: branch commits are invisible through main until the fast-forward flip") {
    import spark.implicits._
    val base = freshBase()
    val (versions, refs) = (base + "/versions", base + "/refs")
    def commit(rows: Seq[(Long, String)]): Long = {
      val path = base + s"/data_${rows.length}"
      rows.toDF("k", "v").write.mode("overwrite").parquet(path)
      ManifestStore.publish(spark, versions,
        spark.read.parquet(path).groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("n_rows")))
    }
    def rowsThrough(name: String): Long = {
      val (_, v) = RefStore.resolve(spark, refs, name)
      val (_, man) = ManifestStore.at(spark, versions, Some(v))
      spark.read.parquet(man.select("file").collect().map(_.getString(0)): _*).count()
    }
    val v1 = commit(Seq((1L, "a"), (2L, "b")))
    RefStore.set(spark, refs, "main", "branch", v1)
    RefStore.set(spark, refs, "dev", "branch", v1)
    val v2 = commit(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    RefStore.set(spark, refs, "dev", "branch", v2)
    assert(rowsThrough("dev") == 3L && rowsThrough("main") == 2L,
      "a branch commit must be visible through the branch and invisible through main")
    // fast-forward publish = one ref flip, zero data movement
    RefStore.set(spark, refs, "main", "branch",
      RefStore.resolve(spark, refs, "dev")._2)
    assert(rowsThrough("main") == 3L)
  }

  test("refstore: LIVE two-writer CAS race — racing flips to different refs both land") {
    val refs = freshBase() + "/refs"
    RefStore.set(spark, refs, "main", "branch", 1L)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fails = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(name: String, v: Long): Runnable = () => {
      start.await()
      try RefStore.set(spark, refs, name, "branch", v)
      catch { case t: Throwable => fails.add(t) }
    }
    pool.submit(racer("exp_a", 7L)); pool.submit(racer("exp_b", 9L))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(fails.isEmpty, s"racer failed: ${fails.peek()}")
    val after = RefStore.refs(spark, refs)
    // the lost-update hazard: a stale read-modify-write would drop one
    assert(after.get("exp_a").contains(("branch", 7L)), s"lost exp_a in $after")
    assert(after.get("exp_b").contains(("branch", 9L)), s"lost exp_b in $after")
    assert(after.get("main").contains(("branch", 1L)))
    // the ref lake recorded one version per landed flip (1 seed + 2 racers)
    assert(ManifestStore.versions(spark, refs).size == 3)
  }

  test("q_sql_params: bound markers reach the parquet scan as pushed filters") {
    val plan = graft.queries.Relational.qSqlParams(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice") && plan.contains("o_orderdate"),
      s"parameter literals must push down to the scan:\n$plan")
  }

  test("g_ktruss: K4 is a stable 4-truss; a pendant triangle and a tail edge peel away") {
    import spark.implicits._
    // K4 on {1,2,3,4}; a pendant triangle {4,5,6}; a tail edge (6,7)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (6L, 7L)).toDF("a", "b")
    val out = graft.operators.Graph.ktrussOf(edges, k = 4, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: (6,7) has no triangle, pendant-triangle edges have
    // support 1 < 2 — all peeled; K4 edges keep support 2 forever
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"4-truss of K4+pendant+tail must be exactly the K4: $out")
    // k=3 keeps the pendant triangle too (support >= 1), drops the tail
    val t3 = graft.operators.Graph.ktrussOf(edges, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t3.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L) && t3(5L) == 2L,
      s"3-truss must keep the pendant triangle: $t3")
  }

  test("lake streaming source: maxFilesPerTrigger paces version admission; startingVersion replays mid-history") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.feed_rate")
    spark.sql("CREATE TABLE graft.lake.feed_rate (k BIGINT, v STRING)")
    for (i <- 1 to 3)
      spark.sql(s"INSERT INTO graft.lake.feed_rate VALUES ($i, 'v$i')")
    def drain(reader: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val q = reader.writeStream.format("noop")
        .option("checkpointLocation", freshBase() + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val withRows = q.recentProgress.filter(_.numInputRows > 0)
      (withRows.length.toLong, withRows.map(_.numInputRows).sum)
    }
    // each INSERT committed one single-file version: a 1-file cap must
    // pace the drain to one version per micro-batch
    val (batches, rows) = drain(spark.readStream
      .option("maxFilesPerTrigger", "1").table("graft.lake.feed_rate"))
    assert(rows == 3L, s"all rows must arrive, got $rows")
    assert(batches == 3L, s"1-file admission must take 3 batches, got $batches")
    // startingVersion=2 skips version 1's row entirely
    val (_, fromV2) = drain(spark.readStream
      .option("startingVersion", "2").table("graft.lake.feed_rate"))
    assert(fromV2 == 2L, s"startingVersion=2 must deliver versions 2..3 only, got $fromV2")
  }

  test("review-fix pins: MoR streaming refused at analysis; ktruss k<=2 refused; startingVersion=0 named") {
    graft.queries.IOQueries.ensureCatalog(spark)
    // streaming a MoR table: the capability is withheld, so the
    // analyzer refuses cleanly instead of crashing at stream start
    spark.sql("DROP TABLE IF EXISTS graft.lake.mor_nostream")
    spark.sql(
      """CREATE TABLE graft.lake.mor_nostream (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    val e1 = intercept[Exception] {
      spark.readStream.table("graft.lake.mor_nostream")
        .writeStream.format("noop")
        .option("checkpointLocation", freshBase() + "/c")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    }
    assert(e1.getMessage != null &&
      e1.getMessage.toLowerCase.contains("does not support"), s"got: $e1")
    // degenerate truss parameter refused, not silently wrong
    import spark.implicits._
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Graph.ktrussOf(
        Seq((1L, 2L)).toDF("a", "b"), k = 2, rounds = 1).collect()
    }
    assert(e2.getMessage.contains("k >= 3"))
    // startingVersion=0 gets a named validation error, not manifest_v-1
    spark.sql("DROP TABLE IF EXISTS graft.lake.sv_zero")
    spark.sql("CREATE TABLE graft.lake.sv_zero (k BIGINT)")
    spark.sql("INSERT INTO graft.lake.sv_zero VALUES (1)")
    val e3 = intercept[Exception] {
      val q = spark.readStream.option("startingVersion", "0")
        .table("graft.lake.sv_zero")
        .writeStream.format("noop")
        .option("checkpointLocation", freshBase() + "/c2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e3).exists(_.contains("startingVersion must be >= 1")),
      s"got: ${messages(e3)}")
  }

  test("mor: hand data — DELETE masks, UPDATE reinserts, committed data files never rewrite") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.mor_hand")
    spark.sql(
      """CREATE TABLE graft.lake.mor_hand (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.lake.mor_hand VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    val manBase = graft.queries.IOQueries.catalogRoot + "/lake/mor_hand/manifest"
    val v1Files = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 1L).map(_.file).toSet
    assert(v1Files.nonEmpty && v1Files.forall(_.startsWith("data_")))

    spark.sql("DELETE FROM graft.lake.mor_hand WHERE k = 2")
    spark.sql("UPDATE graft.lake.mor_hand SET v = 'c2' WHERE k = 3")

    val out = spark.sql("SELECT k, v FROM graft.lake.mor_hand ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (3L, "c2"), (4L, "d")), s"got $out")
    // projection that prunes the key away still masks (key force-read)
    val vs = spark.sql("SELECT v FROM graft.lake.mor_hand ORDER BY v")
      .collect().map(_.getString(0)).toSeq
    assert(vs == Seq("a", "c2", "d"))
    // count through the masked read
    assert(spark.sql("SELECT count(*) AS n FROM graft.lake.mor_hand")
      .collect().head.getLong(0) == 3L)

    // the merge-on-read contract: every v1 data file carried BY
    // REFERENCE through both DMLs — no data file was rewritten
    val v3 = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 3L)
    assert(v1Files.subsetOf(v3.map(_.file).toSet),
      s"v1 files ${v1Files} must all survive in v3 ${v3.map(_.file)}")
    val delRows = v3.filter(_.file.startsWith("deletes_"))
    assert(delRows.nonEmpty, "DML must land equality-delete files")
    assert(delRows.map(_.nRows).sum == 2L,
      s"one key deleted + one updated = 2 delete keys, got ${delRows.map(_.nRows).sum}")
    // seq rule: v1 data files carry seq 1; the UPDATE's reinserted row
    // carries seq 3 and is NOT masked by the seq-3 delete of k=3
    assert(v3.filter(r => v1Files.contains(r.file)).forall(_.seq == 1L))

    // time travel: the pre-DML snapshot is intact
    assert(spark.sql("SELECT count(*) AS n FROM graft.lake.mor_hand VERSION AS OF 1")
      .collect().head.getLong(0) == 4L)

    // OPTIMIZE must refuse while delete files are live (resurrection)
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.optimize(table => 'lake.mor_hand', target_rows => 1000)")
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("live delete files"),
      s"unexpected: $e")

    // compaction path: INSERT OVERWRITE from the masked self-read via a
    // staged temp view writes a clean snapshot with no delete files
    val masked = spark.sql("SELECT * FROM graft.lake.mor_hand")
    masked.createOrReplaceTempView("mor_hand_masked")
    spark.sql("INSERT OVERWRITE graft.lake.mor_hand SELECT * FROM mor_hand_masked")
    val v4 = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 4L)
    assert(v4.forall(r => !r.file.startsWith("deletes_")))
    assert(spark.sql("SELECT count(*) AS n FROM graft.lake.mor_hand")
      .collect().head.getLong(0) == 3L)
  }

  test("meta tables: history rows track commits incl. the delete-file split; files shows the live manifest") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.meta_hand")
    spark.sql(
      """CREATE TABLE graft.lake.meta_hand (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.lake.meta_hand VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("DELETE FROM graft.lake.meta_hand WHERE k = 2")
    val hist = spark.sql(
      """SELECT version, n_data_files, n_rows, n_delete_files, n_delete_keys
        |FROM graft.lake.meta_hand.history ORDER BY version""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(hist.length == 2)
    assert(hist(0)._1 == 1L && hist(0)._3 == 3L && hist(0)._4 == 0L)
    // v2 (MoR delete): SAME data files and rows, one delete file, one key
    assert(hist(1) == (2L, hist(0)._2, 3L, 1L, 1L), s"got ${hist(1).toString}")
    // commit instants are strictly increasing (the K36 normalization)
    val times = spark.sql(
      "SELECT committed_at_millis FROM graft.lake.meta_hand.history ORDER BY version")
      .collect().map(_.getLong(0))
    assert(times(0) < times(1))
    val files = spark.sql(
      "SELECT file, n_rows, seq, is_delete FROM graft.lake.meta_hand.files ORDER BY file")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(files.count(_._4) == 1 && files.filter(_._4).head._2 == 1L)
    assert(files.filter(!_._4).forall(_._3 == 1L), "data files keep their v1 seq")
    assert(files.filter(_._4).forall(f => f._1.startsWith("deletes_") && f._3 == 2L))
    // a REAL table named like a metadata suffix still wins resolution
    spark.sql("DROP TABLE IF EXISTS graft.lake.history")
    spark.sql("CREATE TABLE graft.lake.history (x BIGINT)")
    spark.sql("INSERT INTO graft.lake.history VALUES (42)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.lake.history")
      .collect().head.getLong(0) == 1L)
  }

  test("refstore: dropping the LAST ref leaves a usable (empty) store") {
    val refs = freshBase() + "/refs"
    RefStore.set(spark, refs, "main", "branch", 1L)
    RefStore.drop(spark, refs, "main")
    assert(RefStore.refs(spark, refs).isEmpty)
    RefStore.set(spark, refs, "main", "branch", 2L) // store must still accept flips
    assert(RefStore.resolve(spark, refs, "main") == ("branch", 2L))
  }

  test("vacuum: live equality-delete files survive; stale CTAS stagings are swept, fresh ones kept") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.mor_vac")
    spark.sql(
      """CREATE TABLE graft.lake.mor_vac (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.lake.mor_vac VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("DELETE FROM graft.lake.mor_vac WHERE k = 2")
    // plant a STALE orphaned staging (driver-death residue) and a
    // FRESH one (a live CTAS build) in the namespace
    val nsDir = new java.io.File(graft.queries.IOQueries.catalogRoot + "/lake")
    val stale = new java.io.File(nsDir, ".staging_deadbeef0001_t")
    val fresh = new java.io.File(nsDir, ".staging_cafebabe0002_t")
    stale.mkdirs(); fresh.mkdirs()
    assert(stale.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))
    spark.sql("CALL graft.system.vacuum(table => 'lake.mor_vac', keep => 10)").collect()
    assert(!stale.exists(), "a 48h-old orphaned staging dir must be swept")
    assert(fresh.exists(), "a fresh staging dir (live CTAS) must survive")
    fresh.delete()
    // the live delete file survived the sweep: the masked read still works
    val out = spark.sql("SELECT k FROM graft.lake.mor_vac ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L), s"masked read after vacuum: $out")
  }

  test("staged ctas/rtas: failures leave no table / the old table untouched; no staging residue") {
    graft.queries.IOQueries.ensureCatalog(spark)
    val nsDir = new java.io.File(graft.queries.IOQueries.catalogRoot + "/lake")
    def stagingResidue(): Seq[String] =
      Option(nsDir.list()).getOrElse(Array.empty[String])
        .filter(_.startsWith(".staging_")).toSeq
    // failed CTAS: the staged write throws mid-query → no table exists,
    // nothing listed, no staging dir left behind
    spark.sql("DROP TABLE IF EXISTS graft.lake.ctas_fail")
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.lake.ctas_fail AS
          |SELECT CASE WHEN k > 1 THEN raise_error('boom') ELSE 'ok' END AS v
          |FROM VALUES (1), (2) t(k)""".stripMargin)
    }
    assert(!spark.catalog.tableExists("graft.lake.ctas_fail"),
      "a failed CTAS must not leave a table")
    assert(stagingResidue().isEmpty, s"staging residue: ${stagingResidue()}")
    // failed RTAS: the old table survives byte-identical
    spark.sql("DROP TABLE IF EXISTS graft.lake.rtas_keep")
    spark.sql("CREATE TABLE graft.lake.rtas_keep AS SELECT 1L AS k, 'a' AS v")
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE graft.lake.rtas_keep AS
          |SELECT CASE WHEN k > 1 THEN raise_error('boom') ELSE 'ok' END AS v
          |FROM VALUES (1), (2) t(k)""".stripMargin)
    }
    val kept = spark.sql("SELECT k, v FROM graft.lake.rtas_keep").collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 1L && kept.head.getString(1) == "a",
      "a failed RTAS must leave the old table intact")
    assert(stagingResidue().isEmpty)
    // duplicate CTAS: refused at commit, the original intact
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.lake.rtas_keep AS SELECT 9L AS k, 'z' AS v")
    }
    assert(spark.sql("SELECT v FROM graft.lake.rtas_keep").collect().head.getString(0) == "a")
    assert(stagingResidue().isEmpty)
    // successful RTAS changes the schema in one statement and keeps
    // the old snapshot's versions committed
    spark.sql("REPLACE TABLE graft.lake.rtas_keep AS SELECT 7L AS n_total")
    assert(spark.sql("SELECT n_total FROM graft.lake.rtas_keep")
      .collect().head.getLong(0) == 7L)
  }

  test("lake streaming source: a rewrite version fails the stream with a named error; ignoreChanges streams past it") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.feed_guard")
    spark.sql("CREATE TABLE graft.lake.feed_guard (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.lake.feed_guard VALUES (1,'a'),(2,'b')")
    val ckpt = freshBase() + "/ckpt"
    def drain(reader: org.apache.spark.sql.DataFrame): Long = {
      // noop sink: checkpoint-recoverable (memory/append is not);
      // delivered rows counted from the progress actuals
      val q = reader.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    // first run consumes v1 and records its offset in the checkpoint
    assert(drain(spark.readStream.table("graft.lake.feed_guard")) == 2L)
    // an OVERWRITE removes v1's files — a non-append version; the
    // RESUMED stream (which already delivered v1) must refuse it
    spark.sql("INSERT OVERWRITE graft.lake.feed_guard VALUES (3,'c')")
    val e = intercept[Exception] {
      drain(spark.readStream.table("graft.lake.feed_guard"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ignoreChanges")),
      s"the non-append guard must name the escape hatch: ${messages(e)}")
    // the documented escape hatch: the resumed stream delivers the
    // rewrite version's ADDED file and moves on
    val n = drain(spark.readStream
      .option("ignoreChanges", "true").table("graft.lake.feed_guard"))
    assert(n == 1L, s"ignoreChanges must deliver the added file's rows, got $n")
  }

  test("compact_deletes: folds the delete backlog into a clean snapshot; OPTIMIZE runs again") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.mor_compact")
    spark.sql(
      """CREATE TABLE graft.lake.mor_compact (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.lake.mor_compact VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql("DELETE FROM graft.lake.mor_compact WHERE k IN (2, 4)")
    val out = spark.sql(
      "CALL graft.system.compact_deletes(table => 'lake.mor_compact')")
      .collect().head
    assert(out.getLong(0) == 1L && out.getLong(1) == 2L,
      s"one delete file with two keys expected, got $out")
    val manBase = graft.queries.IOQueries.catalogRoot + "/lake/mor_compact/manifest"
    val after = org.apache.spark.sql.graft.GraftLakeTable.manifestRowsFull(
      spark, manBase, ManifestStore.versions(spark, manBase).last)
    assert(after.forall(r => !r.file.startsWith("deletes_")))
    assert(spark.sql("SELECT k FROM graft.lake.mor_compact ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the masked snapshot before compaction stays time-travelable
    assert(spark.sql("SELECT count(*) FROM graft.lake.mor_compact VERSION AS OF 1")
      .collect().head.getLong(0) == 4L)
    // OPTIMIZE refused on live deletes — now it runs
    spark.sql("CALL graft.system.optimize(table => 'lake.mor_compact', target_rows => 1000)")
      .collect()
    // idempotent: a second call is a no-op
    val again = spark.sql(
      "CALL graft.system.compact_deletes(table => 'lake.mor_compact')")
      .collect().head
    assert(again.getLong(0) == 0L && again.getLong(1) == 0L)
  }

  test("mor: MERGE INTO applies upserts + deletes as delta, one version, no file rewrite") {
    graft.queries.IOQueries.ensureCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft.lake.mor_merge")
    spark.sql(
      """CREATE TABLE graft.lake.mor_merge (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES('graft.merge-on-read.key'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.lake.mor_merge VALUES (1,'a'),(2,'b'),(3,'c')")
    val manBase = graft.queries.IOQueries.catalogRoot + "/lake/mor_merge/manifest"
    val v1Files = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 1L).map(_.file).toSet
    import spark.implicits._
    Seq((2L, "B", "u"), (3L, "", "d"), (9L, "Z", "i"))
      .toDF("k", "v", "op").createOrReplaceTempView("mor_cdc")
    spark.sql(
      """MERGE INTO graft.lake.mor_merge t USING mor_cdc s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val out = spark.sql("SELECT k, v FROM graft.lake.mor_merge ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (9L, "Z")), s"got $out")
    // exactly one new version; v1 files carried by reference
    val vs = ManifestStore.versions(spark, manBase)
    assert(vs == Seq(1L, 2L), s"one MERGE = one version, got $vs")
    val v2 = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 2L)
    assert(v1Files.subsetOf(v2.map(_.file).toSet))
    assert(v2.exists(_.file.startsWith("deletes_")))
  }
}
