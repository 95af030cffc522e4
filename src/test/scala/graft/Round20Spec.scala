package graft

import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Round-9 specs: the DSv2 TableCatalog contract (K29) — the
  * oracle-invisible half of `sink_catalog_sql` — and the LIVE
  * two-publisher race at the ManifestStore commit that K11/K25 claimed
  * but never raced (VERDICT r8 "What's missing" #2).
  */
class Round20Spec extends SparkSpec {

  private def freshCatalog(prefix: String): String = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_$prefix").toString
    // ONE catalog name per root: the CatalogManager caches the plugin
    // instance at first use, so a reused name would keep a stale root
    val cat = s"gcat_$prefix"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    cat
  }

  test("catalog: one atomic manifest version per INSERT; VERSION AS OF isolates pinned snapshots") {
    val cat = freshCatalog("k29commit")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val manBase = s"$root/lake/t/manifest"
    assert(graft.sinks.ManifestStore.versions(spark, manBase).isEmpty,
      "CREATE TABLE must not consume a version")
    // empty table is a first-class snapshot: zero rows, full schema
    val empty = spark.sql(s"SELECT * FROM $cat.lake.t")
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("k", "v"))

    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('a', 1), ('b', 2)")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L),
      "first INSERT must commit exactly version 1")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('c', 3)")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L),
      "second INSERT must commit exactly version 2")

    // pinned v1 must replay the first batch exactly, even after v2
    val v1 = spark.sql(s"SELECT k, v FROM $cat.lake.t VERSION AS OF 1 ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v1 == Seq(("a", 1L), ("b", 2L)))
    val latest = spark.sql(s"SELECT count(*) FROM $cat.lake.t").head.getLong(0)
    assert(latest == 3L)
    // a never-committed pin fails loudly, listing what exists
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 9").collect()
    }
    assert(err.getMessage.contains("9") || err.getCause != null)

    // INSERT OVERWRITE commits ONE new version listing ONLY new files;
    // prior versions stay committed (what keeps time travel free)
    spark.sql(s"INSERT OVERWRITE $cat.lake.t VALUES ('z', 99)")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L, 3L))
    val v3Files = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRows(spark, manBase, 3L).map(_._1)
    val v2Files = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRows(spark, manBase, 2L).map(_._1)
    assert(v3Files.nonEmpty && v3Files.toSet.intersect(v2Files.toSet).isEmpty,
      "overwrite must not carry prior files")
    assert(spark.sql(s"SELECT k FROM $cat.lake.t").collect().map(_.getString(0)).toSeq == Seq("z"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t VERSION AS OF 2").head.getLong(0) == 3L,
      "pre-overwrite snapshots must survive the overwrite")
  }

  test("catalog: CREATE is exclusive, DROP removes, zero-row INSERT still commits, SHOW TABLES lists") {
    val cat = freshCatalog("k29ddl")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    intercept[Exception] { spark.sql(s"CREATE TABLE $cat.lake.t (x INT)") }
    // a zero-row INSERT is still one commit, and the table stays readable
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    spark.sql(s"INSERT INTO $cat.lake.t SELECT 'x' AS k, 1L AS v WHERE 1 = 0")
    assert(graft.sinks.ManifestStore.versions(spark, s"$root/lake/t/manifest") == Seq(1L))
    assert(spark.sql(s"SELECT * FROM $cat.lake.t").count() == 0L)
    assert(spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getAs[String]("tableName")).contains("t"))
    spark.sql(s"DROP TABLE $cat.lake.t")
    assert(spark.sql(s"SHOW TABLES IN $cat.lake").collect().isEmpty)
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.lake.t").collect() }
    // recreate after drop starts a fresh history at version 1
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('a', 1)")
    assert(graft.sinks.ManifestStore.versions(spark, s"$root/lake/t/manifest") == Seq(1L))
  }

  test("catalog: filters and pruning reach the parquet scan through the catalog") {
    val cat = freshCatalog("k29scan")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT, w BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('a', 1, 10), ('b', 2, 20), ('c', 3, 30)")
    val plan = spark.sql(s"SELECT k FROM $cat.lake.t WHERE v > 1")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,1)]"),
      s"filter must push into the parquet scan, got:\n$plan")
    assert(plan.contains("ReadSchema: struct<k:string,v:bigint>"),
      s"unused column w must be pruned from the scan, got:\n$plan")
  }

  test("catalog: two LIVE concurrent INSERTs both land (append serializes, no lost files)") {
    val cat = freshCatalog("k29race")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    try {
      val futures = Seq("p", "q").map { tag =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            spark.sql(
              s"INSERT INTO $cat.lake.t SELECT '$tag' AS k, id AS v FROM range(50)")
          }
        })
      }
      gate.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(graft.sinks.ManifestStore.versions(spark, s"$root/lake/t/manifest") == Seq(1L, 2L),
      "two INSERTs must serialize into exactly versions 1 and 2")
    val byTag = spark.sql(s"SELECT k, count(*) AS n FROM $cat.lake.t GROUP BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byTag == Map("p" -> 50L, "q" -> 50L),
      s"the losing INSERT must retry on the winner's file list, got $byTag")
  }

  test("manifest commit: two LIVE racing publishers — one wins each version, every committed list is complete") {
    val base = java.nio.file.Files.createTempDirectory("graft_manrace").toString + "/man"
    import spark.implicits._
    // ManifestStore.publish stages lazily per attempt, so pre-resolve
    // the frames once; each publisher's manifest has a distinct size
    val manA = (1 to 7).map(i => (s"a_$i", i.toLong)).toDF("file", "n_rows")
    val manB = (1 to 11).map(i => (s"b_$i", i.toLong)).toDF("file", "n_rows")
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val out = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    try {
      val fa = pool.submit(new Runnable {
        override def run(): Unit = { gate.await()
          out.put("a", graft.sinks.ManifestStore.publish(spark, base, manA)) }
      })
      val fb = pool.submit(new Runnable {
        override def run(): Unit = { gate.await()
          out.put("b", graft.sinks.ManifestStore.publish(spark, base, manB)) }
      })
      gate.countDown()
      Seq(fa, fb).foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    // exactly one winner per version, both committed, no gaps
    assert(Set(out.get("a"), out.get("b")) == Set(1L, 2L),
      s"racing publishers must claim distinct consecutive versions, got $out")
    assert(graft.sinks.ManifestStore.versions(spark, base) == Seq(1L, 2L))
    // every committed version holds a COMPLETE file list — exactly the
    // rows its winning publisher staged, nothing merged or torn
    val sizes = Map("a" -> 7, "b" -> 11)
    Seq("a", "b").foreach { tag =>
      val v = out.get(tag)
      val rows = spark.read.schema("file STRING, n_rows BIGINT")
        .json(s"$base/manifest_v$v")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(rows.size == sizes(tag) && rows.forall(_.startsWith(s"${tag}_")),
        s"version $v must hold exactly publisher $tag's complete list, got $rows")
    }
  }

  test("catalog DELETE: one survivor-rewrite commit, null predicate keeps the row, history pinned") {
    val cat = freshCatalog("k30del")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('a', 1), ('b', 2), (NULL, 3)")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val manBase = s"$root/lake/t/manifest"
    spark.sql(s"DELETE FROM $cat.lake.t WHERE k = 'a'")
    // exactly one new version; files the predicate MAY touch (the 'a'
    // file by its stats, the all-NULL file conservatively — it has no
    // k stats) are rewritten into FRESH files, provably-clean files
    // carry by reference (K35's min/max refinement of K14)
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L))
    val v1Rows = org.apache.spark.sql.graft.GraftLakeTable.manifestRowsFull(spark, manBase, 1L)
    val v2Files = org.apache.spark.sql.graft.GraftLakeTable.manifestRowsFull(spark, manBase, 2L)
      .map(_.file).toSet
    assert(v2Files.nonEmpty)
    val touched = v1Rows.filter(r => r.stats.get("k") match {
      case Some(Seq(mn, mx)) => mn <= "a" && "a" <= mx
      case _ => true // no stats (all-NULL file) -> conservatively touched
    }).map(_.file).toSet
    val clean = v1Rows.map(_.file).toSet -- touched
    assert((touched & v2Files).isEmpty,
      s"touched files must be rewritten into fresh files: $touched vs $v2Files")
    assert(clean.subsetOf(v2Files),
      s"provably-clean files must carry by reference: $clean vs $v2Files")
    // DELETE null semantics: k = 'a' is NULL for the NULL row → kept
    val left = spark.sql(s"SELECT v FROM $cat.lake.t ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L, 3L), s"NULL-predicate row must survive, got $left")
    // the pre-delete snapshot is still a complete pinned read
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t VERSION AS OF 1").head.getLong(0) == 3L)
  }

  test("catalog ALTER ADD COLUMN: meta-only evolution — no committed file rewritten, legacy rows null-fill") {
    val cat = freshCatalog("k31evolve")
    spark.sql(s"CREATE TABLE $cat.lake.t (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('a', 1)")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val manBase = s"$root/lake/t/manifest"
    val preFiles = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRows(spark, manBase, 1L).map(_._1)
    val preBytes = preFiles.map(f => new java.io.File(s"$root/lake/t/$f").length())
    spark.sql(s"ALTER TABLE $cat.lake.t ADD COLUMNS (w STRING)")
    // evolution is a meta-file edit: no new version, no file touched
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L),
      "ADD COLUMN must not consume a data version")
    assert(preFiles.map(f => new java.io.File(s"$root/lake/t/$f").length()) == preBytes,
      "ADD COLUMN must not rewrite committed files")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES ('b', 2, 'tagged')")
    val rows = spark.sql(s"SELECT k, v, w FROM $cat.lake.t ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq(("a", 1L, null), ("b", 2L, "tagged")),
      s"legacy rows must null-fill the added column, got $rows")
    // the UNSAFE evolutions are refused: dropping or re-typing would
    // re-map existing immutable files
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.lake.t DROP COLUMN v") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.lake.t ALTER COLUMN v TYPE STRING") }
  }

  test("lake txn commits: one version per distinct txn, redelivered tags skip, zero-row insert keeps its commit") {
    val base = java.nio.file.Files.createTempDirectory("graft_txn").toString + "/t"
    val manBase = s"$base/manifest"
    import spark.implicits._
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    def applyBatch(df: org.apache.spark.sql.DataFrame, txn: String): Unit =
      if (!org.apache.spark.sql.graft.GraftLakeTable.committedTxns(spark, manBase).contains(txn))
        org.apache.spark.sql.graft.GraftLakeTable.insert(spark, base, df, overwrite = false, txn = txn)
    applyBatch(b0, "q:0")
    applyBatch(b0, "q:0") // redelivery — must not commit a second version
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L))
    applyBatch(Seq(("c", 3L)).toDF("k", "v"), "q:1")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(1L, 2L))
    assert(org.apache.spark.sql.graft.GraftLakeTable.committedTxns(spark, manBase) ==
      Set("q:0", "q:1"))
    // carried files must never re-assert their old txn: version 2's
    // rows tag only the NEW file
    val v2 = spark.read.schema("file STRING, n_rows BIGINT, txn STRING")
      .json(s"$manBase/manifest_v2").collect()
    assert(v2.count(_.getString(2) == "q:1") == 1 &&
      v2.count(_.getString(2) == "q:0") == 0,
      "carried rows must carry an empty txn, not the old one")
    // rows are exactly the two batches, once each
    val rows = spark.read.parquet(
        org.apache.spark.sql.graft.GraftLakeTable.manifestRows(spark, manBase, 2L)
          .map(r => s"$base/${r._1}"): _*)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("g_closeness hand data: path graph harmonics computed by hand, landmark self-distance excluded") {
    import spark.implicits._
    // path 1—2—3—4—5, landmarks = 2 smallest ids {1, 2}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = graft.operators.Graph.closenessOf(pairs, iters = 4,
      nLandmarks = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // by hand (1e6 div d): n3: lm1 d2 + lm2 d1 = 1_500_000; n1: lm2 d1;
    // n2: lm1 d1 (its own lm2 distance-0 row is excluded); n4: d3+d2 =
    // 333333+500000; n5: d4+d3 = 250000+333333; ties break node-asc
    assert(got == Seq(
      (3L, 2L, 1500000L), (1L, 1L, 1000000L), (2L, 1L, 1000000L),
      (4L, 2L, 833333L), (5L, 2L, 583333L)), s"got $got")
  }

  test("ts_croston hand data: scalar replay of the size/interval smoothings, short-history part excluded") {
    import spark.implicits._
    def day(s: String) = java.sql.Date.valueOf(s)
    // part 1: demands 2,4,6,2,10 on gaps 1,2,3,4,1 days; part 2: only
    // 3 events — below minEvents, must not appear
    val demand = Seq(
      (1L, day("2020-01-01"), 2000000L), (1L, day("2020-01-03"), 4000000L),
      (1L, day("2020-01-06"), 6000000L), (1L, day("2020-01-10"), 2000000L),
      (1L, day("2020-01-11"), 10000000L),
      (2L, day("2020-01-01"), 1000000L), (2L, day("2020-01-02"), 1000000L),
      (2L, day("2020-01-03"), 1000000L)
    ).toDF("part", "d", "q")
    val got = graft.queries.TimeSeries.crostonOf(demand, lags = 14,
      minEvents = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent SCALAR replay (BigInt sums, the same three rounded
    // divisions) — the bit-exact driver-replay pattern
    val wts = graft.queries.TimeSeries.ewmaWeights(14)
    val qs = Seq(2L, 4L, 6L, 2L, 10L).map(_ * 1000000L)
    val gaps = Seq(1L, 2L, 3L, 4L, 1L).map(_ * 1000000L)
    val js = Seq(4, 3, 2, 1, 0) // j = n - i
    val den = js.map(wts).sum
    val znum = qs.zip(js).map { case (q, j) => BigInt(q) * wts(j) }.sum
    val pnum = gaps.zip(js).map { case (g, j) => BigInt(g) * wts(j) }.sum
    val z = math.round(znum.toDouble / den)
    val p = math.round(pnum.toDouble / den)
    val rate = math.round(1e6 * z.toDouble / p)
    assert(got.toSeq == Seq((1L, 5L, z, p, rate)), s"got ${got.toSeq}, want (1,5,$z,$p,$rate)")
  }

  test("catalog: rename re-roots every version's manifest; data survives under the new name") {
    val cat = freshCatalog("k29rename")
    spark.sql(s"CREATE TABLE $cat.lake.src (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.src VALUES ('a', 1)")
    spark.sql(s"INSERT INTO $cat.lake.src VALUES ('b', 2)")
    spark.sql(s"ALTER TABLE $cat.lake.src RENAME TO lake.dst")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.dst").head.getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.dst VERSION AS OF 1").head.getLong(0) == 1L,
      "history must survive the rename")
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.lake.src").collect() }
  }
}
