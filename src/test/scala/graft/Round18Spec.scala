package graft

import org.apache.spark.sql.functions._

/** Round-8 (third batch) hand-data and mechanics specs for the seven
  * new operators — the standing adversarial-review defense: bugs
  * mirrored into `oracleSql` hash-match anyway, so each family gets a
  * check the oracle cannot replicate (closed-form hand data, disk
  * mechanics, cross-operator consistency).
  */
class Round18Spec extends SparkSpec {

  test("sink_restore: metadata-only restore — v3 ≡ v1 file list, zero data writes, v2 still damaged") {
    val base = java.nio.file.Files.createTempDirectory("graft_restore_spec").toString
    graft.queries.IOQueries.sinkRestore(spark, sfDir, baseOverride = Some(base)).collect()
    def filesAt(v: Long): Set[String] =
      graft.sinks.ManifestStore.at(spark, base + "/manifest", Some(v))._2
        .select("file").collect().map(_.getString(0)).toSet
    val (v1, v2, v3) = (filesAt(1L), filesAt(2L), filesAt(3L))
    assert(v3 == v1, "restore must republish exactly the pinned version's files")
    assert(v2.subsetOf(v1) && v2 != v1, "the bad commit must have dropped files")
    // zero data writes: every file v3 references already existed for v1
    // (restore adds nothing to the lake — the union of manifests covers disk)
    val onDisk = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(base + "/lake"), Array("parquet"), true)
    assert(onDisk.size == v1.size, "restore must not land new data files")
    // forensics intact: the damaged snapshot still serves (months < cutoff only)
    val v2Months = spark.read.parquet(v2.toSeq: _*)
      .select("month").distinct().collect().map(_.getString(0))
    assert(v2Months.forall(_ < "1997-01"), "v2 must still be the damaged snapshot")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("sink_drop_column: zero-write logical drop; REORG rewrites only wide files; footers physically narrow") {
    val base = java.nio.file.Files.createTempDirectory("graft_dropcol_spec").toString
    graft.queries.IOQueries.sinkDropColumn(spark, sfDir, baseOverride = Some(base)).collect()
    def manifest(v: Long) =
      graft.sinks.ManifestStore.at(spark, base + "/manifest", Some(v))._2
    // the drop commit (v2) references exactly v1's files — nothing written
    val f1 = manifest(1L).select("file").collect().map(_.getString(0)).toSet
    val f2 = manifest(2L).select("file").collect().map(_.getString(0)).toSet
    assert(f2 == f1, "logical drop must be metadata-only")
    // v2's TABLE schema lost the column; its files' PHYSICAL schema kept it
    val v2rows = manifest(2L).select("table_ddl", "file_ddl").collect()
    assert(v2rows.forall(r => !r.getString(0).contains("o_orderpriority")))
    assert(v2rows.forall(r => r.getString(1).contains("o_orderpriority")))
    // final version: no file physically wide; batch2 carried by reference
    val v4 = manifest(4L).select("file", "file_ddl").collect()
    assert(v4.forall(r => !r.getString(1).contains("o_orderpriority")))
    val batch2 = manifest(3L).filter(col("file").contains("/batch2/"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(batch2.nonEmpty &&
      batch2.subsetOf(v4.map(_.getString(0)).toSet),
      "post-drop narrow files must carry into v4 untouched")
    // footer truth, not just manifest claim: post-REORG files lack the column
    val purged = v4.map(_.getString(0)).filter(_.contains("/purged/"))
    assert(purged.nonEmpty)
    assert(!spark.read.parquet(purged: _*).columns.contains("o_orderpriority"),
      "REORG output footers must be physically narrow")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("q_pit_join: half-open SCD2 ranges — every in-history fact lands exactly once, pre-history facts never") {
    val out = graft.queries.Relational.qPitJoin(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    // independent expected count: facts shipping on/after their
    // customer's FIRST order date (= the first version's valid_from);
    // anything earlier has no dimension truth and must be excluded
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val firstSeen = orders.groupBy("o_custkey")
      .agg(min("o_orderdate").as("first_from"))
    val expected = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(firstSeen, "o_custkey")
      .filter(col("l_shipdate") >= col("first_from"))
      .count()
    assert(out == expected,
      s"PIT join must match each in-history fact exactly once ($out vs $expected)")
    assert(out < graft.Tables.load(spark, sfDir, "lineitem").count(),
      "the synthetic feed plants pre-history facts — the exclusion path must be exercised")
  }

  test("ts_holt: constant series forecasts itself exactly; linear series tracks within one slope step") {
    import spark.implicits._
    def series(rows: Seq[(String, Long)]) =
      rows.toDF("ds", "y").select(col("ds").cast("date").as("d"), col("y"))
    val days = (1 to 40).map(i => f"2020-01-$i%02d").take(31) ++
      (1 to 9).map(i => f"2020-02-$i%02d")
    // constant: level = c, trend = 0 → forecast = c, zero error everywhere
    val const = graft.queries.TimeSeries.holtOf(
      series(days.map(d => (d, 5000000L)))).collect()
    assert(const.nonEmpty && const.forall(_.getAs[Long]("abs_err_micro") == 0L),
      "Brown smoothing must be exact on a constant series")
    // linear y = a + b·t: after both passes warm up (2·14 rows), the
    // extrapolation undershoots by at most ~(1 − w̄/3)·b < b per step
    val b = 1000000L
    val lin = graft.queries.TimeSeries.holtOf(
      series(days.zipWithIndex.map { case (d, i) => (d, 10000000L + b * i) }))
      .filter(col("d") >= "2020-01-29").collect()
    assert(lin.nonEmpty && lin.forall(_.getAs[Long]("abs_err_micro") <= b),
      "Brown smoothing must track a linear trend within one slope unit after warm-up")
  }

  test("t_feature_hash: hand tokens land in the md5-derived bucket with the md5-derived sign") {
    import spark.implicits._
    def expected(tok: String, n: Int): (Long, Long) = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def a(i: Int) = m.charAt(i - 1).toInt
      val f = ((a(1) * 131 + a(2)) * 131 + a(3)) * 131 + a(4)
      (f % n.toLong, if (a(5) % 2 == 0) 1L else -1L)
    }
    val out = graft.queries.TextQueries.featureHashOf(
      Seq((1L, "aa bb aa"), (2L, "cc")).toDF("doc_id", "text"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (bAA, sAA) = expected("aa", 64)
    val (bBB, sBB) = expected("bb", 64)
    val (bCC, sCC) = expected("cc", 64)
    assert(bAA != bBB, "test tokens must not collide for the doc-1 assertion")
    assert(out((1L, bAA)) == 2 * sAA, "repeated token must accumulate its sign twice")
    assert(out((1L, bBB)) == sBB)
    assert(out((2L, bCC)) == sCC)
    assert(out.size == 3)
  }

  test("new batch plan shapes: key-equi joins only, no nested-loop fallback on any data path") {
    Seq(
      graft.queries.Relational.qPitJoin(spark, sfDir),
      graft.queries.Analytics.negSample(spark, sfDir),
      graft.queries.TextQueries.featureHash(spark, sfDir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested-loop join in:\n$plan")
    }
  }

  test("t_neg_sample: negatives are NEVER positives, every customer gets full k, keys in range, reproducible") {
    val neg = graft.queries.Analytics.negSample(spark, sfDir).cache()
    val positives = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct()
    assert(neg.join(positives, Seq("custkey", "partkey"), "inner").count() == 0,
      "a sampled negative that the customer actually bought is a label error")
    val perCust = neg.groupBy("custkey").count()
    assert(perCust.filter(col("count") =!= 4).count() == 0,
      "m = 2k+4 probes must yield the full k for every customer at this SF")
    val nPart = graft.Tables.load(spark, sfDir, "part").count()
    assert(neg.filter(col("partkey") < 1 || col("partkey") > nPart).count() == 0)
    val again = graft.queries.Analytics.negSample(spark, sfDir)
    assert(neg.exceptAll(again).isEmpty && again.exceptAll(neg).isEmpty,
      "the probe sequence must be reproducible run-over-run")
    neg.unpersist()
  }

  test("ann_range: ball results agree with the exact top-k ranking; impossible radius yields sentinels") {
    val range = graft.operators.Similarity.rangeSearch(spark, sfDir, tau = 0.2, nQueries = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val top1 = graft.operators.Similarity.bruteForceTopK(spark, sfDir, k = 1, nQueries = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    top1.foreach { case (q, (vid, sim)) =>
      val (nWithin, bestVid, bestSim) = range(q)
      if (sim >= 0.2) {
        assert(bestVid == vid && bestSim == sim,
          s"query $q: range argmax must equal the exact top-1")
        assert(nWithin >= 1)
      } else assert(nWithin == 0 && bestVid == -1L && bestSim == -1.0)
    }
    // an impossible radius: every ball empty, every row a sentinel
    val empty = graft.operators.Similarity.rangeSearch(spark, sfDir, tau = 1.01, nQueries = 10)
      .collect()
    assert(empty.length == 10 && empty.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == -1L && r.getDouble(3) == -1.0))
  }
}
