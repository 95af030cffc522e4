package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Round-10 specs: the SQL `MERGE INTO` / `UPDATE` group-based
  * rewrite contract (K32/K33) — the oracle-invisible halves of
  * `sink_catalog_merge`: one atomic version per statement, untouched
  * files carried BY REFERENCE (not rewritten), carry-over rows of
  * touched files surviving the runtime group filter, and the live
  * MERGE/INSERT and MERGE/MERGE races (VERDICT r9 "Next round" #1).
  */
class Round21Spec extends SparkSpec {

  private def freshCatalog(prefix: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_$prefix").toString
    val cat = s"gcat_$prefix"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    (cat, root)
  }

  private def manifestFiles(manBase: String, v: Long): Seq[String] =
    org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, v).map(_.file)

  test("K32 MERGE: one version per statement; untouched files carried by reference; carry-over rows survive") {
    val (cat, root) = freshCatalog("k32carry")
    spark.sql(s"CREATE TABLE $cat.lake.t (k BIGINT, tag STRING, amt DOUBLE)")
    val manBase = s"$root/lake/t/manifest"
    // two INSERTs -> two immutable data dirs with disjoint key ranges;
    // the second is coalesced to ONE file so the matched key (10) and
    // a non-matching neighbor (11) share a file — the carry-over case
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    import spark.implicits._
    Seq((10L, "c", 30.0), (11L, "d", 40.0)).toDF("k", "tag", "amt")
      .coalesce(1).createOrReplaceTempView("r21_batch2")
    spark.sql(s"INSERT INTO $cat.lake.t SELECT * FROM r21_batch2")
    assert(org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 2L)
      .exists(r => r.nRows == 2L &&
        r.stats.get("k").exists { case Seq(mn, mx) => mn == "10" && mx == "11" }),
      "test setup: k=10 and k=11 must share one file")
    val v2Rows = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, 2L)
    val batch1Files = manifestFiles(manBase, 1L).toSet
    // files whose k-range can hold the matched key 10 must be
    // rewritten; every other file must carry (the insert may land one
    // file per row, so group granularity is per-FILE, not per-batch)
    val (touched, untouched) = v2Rows.partition { r =>
      r.stats.get("k").exists { case Seq(mn, mx) =>
        mn.toLong <= 10L && 10L <= mx.toLong }
    }
    assert(touched.nonEmpty && untouched.nonEmpty)
    assert(batch1Files.subsetOf(untouched.map(_.file).toSet))

    // merge touches ONLY the second batch's key range: k=10 updated,
    // k=100 inserted; k=11 shares a file with k=10 (carry-over row)
    Seq((10L, "cX", 300.0), (100L, "new", 1.0)).toDF("k", "tag", "amt")
      .createOrReplaceTempView("r21_src")
    spark.sql(
      s"""MERGE INTO $cat.lake.t t USING r21_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET tag = s.tag, amt = s.amt
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    // exactly ONE new committed version
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L, 3L),
      "one MERGE must commit exactly one manifest version")
    val v3Files = manifestFiles(manBase, 3L).toSet
    // untouched files (k-range can't hold 10) carried BY REFERENCE:
    // the SAME relative paths appear in the new version — no rewrite
    assert(untouched.map(_.file).toSet.subsetOf(v3Files),
      s"untouched files must carry by reference: $untouched vs $v3Files")
    // the file(s) holding k=10 were REPLACED, not carried
    assert((touched.map(_.file).toSet & v3Files).isEmpty,
      s"touched files must be replaced: $touched still in $v3Files")

    // carry-over: k=11 lived in the touched file and did NOT match —
    // it must survive the rewrite byte-identically (this is the row a
    // row-wise runtime filter would silently drop)
    val rows = spark.sql(s"SELECT k, tag, amt FROM $cat.lake.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (10L, "cX", 300.0),
      (11L, "d", 40.0), (100L, "new", 1.0)))
    // pre-merge snapshot stays pinned
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t VERSION AS OF 2")
      .head.getLong(0) == 4L)
  }

  test("K33 UPDATE: group rewrite applies assignment, carries untouched files, pins history") {
    val (cat, root) = freshCatalog("k33upd")
    spark.sql(s"CREATE TABLE $cat.lake.u (k BIGINT, amt DOUBLE)")
    val manBase = s"$root/lake/u/manifest"
    spark.sql(s"INSERT INTO $cat.lake.u VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"INSERT INTO $cat.lake.u VALUES (50, 5.0)")
    val batch1Files = manifestFiles(manBase, 1L).toSet
    spark.sql(s"UPDATE $cat.lake.u SET amt = amt * 10 WHERE k >= 50")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L, 3L))
    val rows = spark.sql(s"SELECT k, amt FROM $cat.lake.u ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 2.0), (50L, 50.0)))
    assert(spark.sql(s"SELECT sum(amt) FROM $cat.lake.u VERSION AS OF 2")
      .head.getDouble(0) == 8.0)
    // the k<50 file was untouched — same relative paths in v3. (The
    // UPDATE condition prunes via static pushdown or runtime stats;
    // either way the carry must hold.)
    val v3Files = manifestFiles(manBase, 3L).toSet
    assert(batch1Files.subsetOf(v3Files),
      s"untouched batch-1 files must carry: $batch1Files vs $v3Files")
  }

  test("K32 MERGE races a concurrent INSERT: both commit, nothing lost") {
    val (cat, root) = freshCatalog("k32race")
    spark.sql(s"CREATE TABLE $cat.lake.r (k BIGINT, amt DOUBLE)")
    val manBase = s"$root/lake/r/manifest"
    spark.sql(s"INSERT INTO $cat.lake.r VALUES (1, 1.0), (2, 2.0)")
    import spark.implicits._
    Seq((2L, 200.0)).toDF("k", "amt").createOrReplaceTempView("r21_race_src")
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val mergeF = pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        spark.sql(
          s"""MERGE INTO $cat.lake.r t USING r21_race_src s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET amt = s.amt""".stripMargin)
      }
    })
    val insertF = pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        spark.sql(s"INSERT INTO $cat.lake.r VALUES (9, 9.0)")
      }
    })
    start.countDown()
    mergeF.get(120, TimeUnit.SECONDS)
    insertF.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // both statements committed (order free), no lost rows either way
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L, 3L))
    val rows = spark.sql(s"SELECT k, amt FROM $cat.lake.r ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 200.0), (9L, 9.0)),
      s"merge + concurrent insert must both land: $rows")
  }

  test("K34 bucketed tables: same-bucket equi-join plans with NO Exchange; layout survives DELETE and MERGE") {
    val (cat, root) = freshCatalog("k34spj")
    val prevBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql(s"CREATE TABLE $cat.lake.a (k BIGINT, va DOUBLE) PARTITIONED BY (bucket(4, k))")
      spark.sql(s"CREATE TABLE $cat.lake.b (k BIGINT, vb STRING) PARTITIONED BY (bucket(4, k))")
      import spark.implicits._
      (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "va")
        .createOrReplaceTempView("r21_bkt_a")
      (1L to 40L).map(i => (i, s"s$i")).toDF("k", "vb")
        .createOrReplaceTempView("r21_bkt_b")
      spark.sql(s"INSERT INTO $cat.lake.a SELECT * FROM r21_bkt_a")
      spark.sql(s"INSERT INTO $cat.lake.b SELECT * FROM r21_bkt_b")

      // every committed file is bucket-routed, one bucket per file
      val manBase = s"$root/lake/a/manifest"
      val files = manifestFiles(manBase, 1L)
      assert(files.nonEmpty && files.forall(_.contains("__graft_bucket=")),
        s"bucketed INSERT must route every file into a bucket dir: $files")

      // the co-located join: storage-partitioned, shuffle-free
      val j = spark.sql(
        s"""SELECT a.k, a.va, b.vb FROM $cat.lake.a a
           |JOIN $cat.lake.b b ON a.k = b.k""".stripMargin)
      assert(j.count() == 40L)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"same-bucket equi-join must plan WITHOUT a shuffle:\n$plan")
      assert(plan.contains("GraftBucketedScan"),
        s"both sides must read through the bucketed scan:\n$plan")
      val rows = j.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      assert(rows.take(2).toSeq == Seq((1L, 1.0, "s1"), (2L, 2.0, "s2")))

      // DELETE keeps the bucket layout (survivor rewrite is
      // bucket-aware), so the join stays shuffle-free afterwards
      spark.sql(s"DELETE FROM $cat.lake.a WHERE k > 30")
      val v2files = manifestFiles(manBase, 2L)
      assert(v2files.nonEmpty && v2files.forall(_.contains("__graft_bucket=")),
        s"post-DELETE files must stay bucket-routed: $v2files")
      val j2 = spark.sql(
        s"""SELECT count(*) FROM $cat.lake.a a
           |JOIN $cat.lake.b b ON a.k = b.k""".stripMargin)
      assert(j2.head.getLong(0) == 30L)
      // the scalar count adds an Exchange SinglePartition on top —
      // the JOIN itself must still be shuffle-free
      assert(!j2.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

      // MERGE preserves the bucket layout (the replace write
      // re-routes the rewritten groups), so the join stays
      // shuffle-free after arbitrary DML
      Seq((1L, 111.0), (99L, 99.0)).toDF("k", "va")
        .createOrReplaceTempView("r21_bkt_m")
      spark.sql(
        s"""MERGE INTO $cat.lake.a t USING r21_bkt_m s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET va = s.va
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val v3files = manifestFiles(manBase, 3L)
      assert(v3files.nonEmpty && v3files.forall(_.contains("__graft_bucket=")),
        s"post-MERGE files must stay bucket-routed: $v3files")
      // the write's clustered distribution puts each bucket in ONE
      // task, so the single-pass router lands at most one NEW file
      // per bucket per DML (without it, every task holding rows of a
      // bucket would open its own file)
      val v2set = manifestFiles(manBase, 2L).toSet
      val newPerBucket = v3files.filterNot(v2set)
        .groupBy(f => f.substring(f.indexOf("__graft_bucket=")).split('/').head)
      assert(newPerBucket.nonEmpty && newPerBucket.values.forall(_.length == 1),
        s"clustered MERGE write must land one file per bucket: $newPerBucket")
      val j3 = spark.sql(
        s"""SELECT sum(a.va) FROM $cat.lake.a a
           |JOIN $cat.lake.b b ON a.k = b.k""".stripMargin)
      // updated k=1 contributes 111 instead of 1; inserted k=99 has no
      // b-side match; survivors of the DELETE contribute 2..30
      assert(j3.head.getDouble(0) == 111.0 + (2L to 30L).map(_.toDouble).sum)
      assert(!j3.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        "bucketed join must stay shuffle-free after MERGE")
    } finally {
      prevBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        v => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("K32 MERGE/MERGE conflict: no lost update — serialize or abort, never both-silently-succeed") {
    val (cat, _) = freshCatalog("k32conflict")
    spark.sql(s"CREATE TABLE $cat.lake.c (k BIGINT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $cat.lake.c VALUES (1, 10.0)")
    import spark.implicits._
    Seq((1L, 1.0)).toDF("k", "inc").createOrReplaceTempView("r21_conf_src")
    def mergeOnce(): Boolean =
      try {
        spark.sql(
          s"""MERGE INTO $cat.lake.c t USING r21_conf_src s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET amt = t.amt + s.inc""".stripMargin)
        true
      } catch { case _: Exception => false }
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fs = Seq.fill(2)(pool.submit(new java.util.concurrent.Callable[Boolean] {
      override def call(): Boolean = { start.await(); mergeOnce() }
    }))
    start.countDown()
    val oks = fs.map(_.get(120, TimeUnit.SECONDS)).count(identity)
    pool.shutdown()
    val amt = spark.sql(s"SELECT amt FROM $cat.lake.c").head.getDouble(0)
    // each SUCCESSFUL merge must be reflected exactly once: both
    // succeeded -> serialized (+2); one aborted on the conflict -> +1.
    // amt = 11.0 with oks == 2 would be the silent lost update.
    assert(amt == 10.0 + oks,
      s"$oks merges reported success but amt=$amt — lost update")
    assert(oks >= 1, "at least one merge must commit")
  }
}
