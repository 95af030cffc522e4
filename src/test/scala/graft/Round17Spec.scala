package graft

import org.apache.spark.sql.functions._

/** Round-8 (second batch) hand-data specs for the seven new operators —
  * the adversarial-review defense for bugs the oracle gate cannot see
  * (an error mirrored into `oracleSql` hash-matches; a hand-built
  * input with a known closed-form answer does not lie).
  */
class Round17Spec extends SparkSpec {

  test("t_impute: group median fill, all-missing group falls back to the global median") {
    import spark.implicits._
    val base = Seq(
      // group a: observed 10, 20, 30 → median 20; two holes
      ("a", 10L, false), ("a", 20L, false), ("a", 30L, false),
      ("a", 999L, true), ("a", 999L, true),
      // group b: NOTHING observed → fill = global median of {10,20,30}
      ("b", 999L, true), ("b", 999L, true), ("b", 999L, true)
    ).toDF("grp", "raw", "miss")
    // raw under miss=true is junk by construction — the imputer must
    // never read it (tImpute's plant nulls it implicitly via `when`)
    val out = graft.queries.Analytics.imputeOf(base)
      .orderBy("grp").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 5 && a.getLong(2) == 2)
    assert(a.getLong(3) == 20L, "group-a fill must be the observed median")
    assert(a.getLong(4) == (10 + 20 + 30 + 20 + 20) / 5)
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 3 && b.getLong(2) == 3)
    assert(b.isNullAt(3), "group b has no observed rows → no group fill value")
    assert(b.getLong(4) == 20L,
      "all-missing group must fall back to the GLOBAL median, not 0/null")
  }

  test("text_encoding: plants detected exactly; clean non-ASCII is NOT flagged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "naïve café crème"), // clean non-ASCII: diagnostic > 0, NOT suspect
      (2L, "plain ascii text"), // fully clean
      (2431L, "hello")          // 11·13·17 → every plant lands at once
    ).toDF("doc_id", "text")
    val rows = graft.queries.TextQueries.encodingGateOf(docs)
      .orderBy("doc_id").collect()
    val clean = rows(0)
    assert(clean.getLong(1) == 0 && clean.getLong(2) == 0 && clean.getLong(3) == 0)
    assert(clean.getLong(4) > 0, "accented text must show a non-ASCII ratio")
    assert(!clean.getBoolean(5), "clean non-ASCII must NOT be suspect — the " +
      "gate is an artifact detector, not an ASCII filter")
    val ascii = rows(1)
    assert(ascii.getLong(4) == 0 && !ascii.getBoolean(5))
    val all = rows(2)
    assert(all.getLong(1) == 1, "one replacement char planted")
    assert(all.getLong(2) == 1, "one C0 control planted")
    assert(all.getLong(3) == 1, "one mojibake sequence planted")
    assert(all.getBoolean(5))
  }

  test("ts_strength: pure weekly cycle scores F_s = 1; pure trend scores F_t = 1") {
    import spark.implicits._
    def series(days: Int)(f: Int => Long) =
      (0 until days).map { i =>
        (java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i)),
          f(i))
      }.toDF("d", "y")
    // palindromic dow pattern → cov(dow, y) = 0 → LS slope exactly 0,
    // detrended ≡ y, dow means exact, residuals 0 → F_s = 1.
    // Deseasonalized is then CONSTANT → F_t undefined (NULL), which is
    // the honest answer for a trendless pure cycle.
    val cycle = Seq(1000000L, 2000000L, 3000000L, 4000000L, 3000000L, 2000000L, 1000000L)
    val c = graft.queries.TimeSeries.seasonalStrengthOf(
      series(28)(i => cycle(i % 7))).head()
    assert(c.getLong(0) == 28)
    assert(c.getLong(1) == 0L, "palindromic cycle has zero LS slope")
    assert(c.getLong(2) == 1000000L, s"pure cycle must score F_s = 1, got $c")
    assert(c.isNullAt(3), "constant deseasonalized series → F_t undefined")
    // pure integer trend → slope recovered exactly, residuals 0 →
    // F_t = 1; detrended constant → F_s undefined (NULL)
    val t = graft.queries.TimeSeries.seasonalStrengthOf(
      series(28)(i => 5000000L + 40L * i)).head()
    assert(t.getLong(1) == 40L, "trend slope must be recovered exactly")
    assert(t.isNullAt(2), "constant detrended series → F_s undefined")
    assert(t.getLong(3) == 1000000L, s"pure trend must score F_t = 1, got $t")
    // cycle + trend → both defined, both strictly inside (0, 1)
    val m = graft.queries.TimeSeries.seasonalStrengthOf(
      series(56)(i => 5000000L + 40L * i + cycle(i % 7))).head()
    assert(m.getLong(2) > 900000L, "strong cycle survives the trend")
    assert(m.getLong(3) > 900000L, "strong trend survives the cycle")
  }

  test("mm_integrity: corrupt offset localizes to the right block; '#' bytes still flip") {
    import spark.implicits._
    val media = Seq(
      (1L, "x" * 130),   // clean (1 % 23 != 0)
      (23L, "y" * 130),  // pos = 23 % 130 + 1 = 24 → block 1
      (115L, "z" * 130), // pos = 115 % 130 + 1 = 116 → block 2
      (46L, "#" * 70),   // all-'#' payload: flip must pick '@', pos 47 → block 1
      (69L, "")          // empty payload, corrupt-eligible id: zero blocks, clean
    ).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val rows = graft.operators.Multimodal.integrityOf(media, 64)
      .orderBy("doc_id").collect()
    val clean = rows(0)
    assert(clean.getLong(1) == 3 && !clean.getBoolean(3) && clean.getLong(4) == 0)
    // sorted by doc_id: 1, 23, 46, 69, 115
    val b1 = rows(1)
    assert(b1.getBoolean(3) && b1.getLong(4) == 1,
      s"offset 24 must localize to block 1, got $b1")
    val hash = rows(2)
    assert(hash.getLong(1) == 2 && hash.getBoolean(3) && hash.getLong(4) == 1,
      s"all-'#' payload must still corrupt (flip to '@'), got $hash")
    // Spark's sequence(0, -1) descends — an unguarded block range would
    // hand an empty payload two phantom blocks (review finding)
    val empty = rows(3)
    assert(empty.getLong(1) == 0 && !empty.getBoolean(3) && empty.getLong(4) == 0,
      s"empty payload must digest to zero blocks and stay clean, got $empty")
    val b2 = rows(4)
    assert(b2.getBoolean(3) && b2.getLong(4) == 2,
      s"offset 116 must localize to block 2, got $b2")
  }

  test("g_components: labels are a sound components partition of the repeat-trade graph") {
    val out = graft.operators.Graph.components(spark, sfDir).cache()
    try {
      // rebuild the operator's own edge derivation and check soundness:
      // every edge's endpoints carry the SAME label (no split component)
      val o = graft.Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
      val l = graft.Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .agg(countDistinct(col("o_orderkey")).as("n"))
        .filter(col("n") >= 2).select("a", "b")
      val lbl = out.select(col("node"), col("component"))
      val split = edges
        .join(lbl.withColumnRenamed("node", "a").withColumnRenamed("component", "ca"), "a")
        .join(lbl.withColumnRenamed("node", "b").withColumnRenamed("component", "cb"), "b")
        .filter(col("ca") =!= col("cb")).count()
      assert(split == 0, s"$split edges cross component boundaries")
      // minimality: every component's label IS its minimum member id
      val badMin = out.groupBy("component").agg(min("node").as("mn"))
        .filter(col("component") =!= col("mn")).count()
      assert(badMin == 0, "component label must equal the min member id")
      // size column consistency
      val badSize = out.groupBy("component", "comp_size")
        .agg(count(lit(1)).as("actual"))
        .filter(col("comp_size") =!= col("actual")).count()
      assert(badSize == 0, "comp_size must equal the component's row count")
    } finally out.unpersist()
  }

  test("q_mv_rewrite: substitution serves the MV files, parity holds, non-matches untouched") {
    import org.apache.spark.sql.graft.MvRewrite
    MvRewrite.ensure(spark)
    MvRewrite.clear(spark)
    def monthly = graft.Tables.load(spark, sfDir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    val path = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString + "/mv"
    MvRewrite.register(spark, "spec_monthly", monthly, path)
    val flag = "spark.graft.mvRewrite"
    val baseline = monthly.orderBy("month").collect()
    try {
      spark.conf.set(flag, "true")
      // LogicalRelation.toString omits file locations — read the real
      // root paths off the HadoopFsRelation leaves
      def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collectLeaves().flatMap {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString)
              case _ => Nil
            }
          case _ => Nil
        }
      val served = monthly.orderBy("month")
      val scans = scanPaths(served)
      assert(scans.exists(_.contains("graft_mv_spec")),
        s"rewritten plan must scan the materialization, got leaves: $scans")
      assert(!scans.exists(_.contains("orders.parquet")),
        "rewritten plan must NOT touch the base table")
      // parity: the MV serves exactly what the direct aggregate computes
      assert(served.collect().toSeq == baseline.toSeq)
      // a non-matching query (extra filter) must be left alone
      val other = graft.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"))
      val otherScans = scanPaths(other)
      assert(otherScans.exists(_.contains("orders.parquet")) &&
        !otherScans.exists(_.contains("graft_mv_spec")),
        "non-matching aggregate must keep scanning the base table")
    } finally {
      spark.conf.unset(flag)
      MvRewrite.clear(spark)
    }
  }

  test("sink_txn: half-transactions are invisible; version 1 is a consistent pair") {
    val base = java.nio.file.Files.createTempDirectory("graft_txn_spec").toString
    val out = graft.queries.IOQueries.sinkTxn(spark, sfDir, Some(base)).collect()
    assert(out.forall(_.getBoolean(5)), "final pair must be consistent")
    // exactly two commits ever happened — the crashed writer's staging
    // never produced a version
    assert(graft.sinks.ManifestStore.versions(spark, base + "/catalog") == Seq(1L, 2L))
    // the crashed writer's files exist on disk…
    val crashed = new java.io.File(base + "/lake/orders_monthly/txn_crashed")
    assert(crashed.exists && crashed.listFiles.exists(_.getName.endsWith(".parquet")))
    // …but no committed catalog version ever lists them
    Seq(1L, 2L).foreach { v =>
      val (_, cat) = graft.sinks.ManifestStore.at(spark, base + "/catalog", Some(v))
      assert(cat.filter(col("file").contains("txn_crashed")).count() == 0,
        s"version $v leaks the crashed writer's files")
    }
    // version 1 is itself a CONSISTENT pair (both tables at half data):
    // cross-table grand counts agree at the pinned version too
    val (_, cat1) = graft.sinks.ManifestStore.at(spark, base + "/catalog", Some(1L))
    def grandN(table: String): Long = {
      val files = cat1.filter(col("table") === table)
        .select("file").collect().map(_.getString(0))
      spark.read.parquet(files: _*).agg(sum("n")).head.getLong(0)
    }
    assert(grandN("orders_monthly") == grandN("orders_by_priority"),
      "version 1 must be a consistent cross-table snapshot")
    // and version 1's data is the half feed, not the crashed full feed
    val half = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0).count()
    assert(grandN("orders_monthly") == half)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("e_stream_quota: stream admit set ≡ batch row_number admit set") {
    val streamed = graft.streaming.Events.streamQuota(spark, sfDir, cap = 20)
    val batch = graft.Tables.eventsTsAsNanosLong(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_seen"),
        sum(when(col("rn") <= 20, 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("rn") <= 20, col("event_id")).otherwise(0L)).as("admitted_id_sum"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "per-user quota admit set must match the batch replay exactly")
    // the cap binds: nobody admitted past it, heavy users rejected some
    val over = streamed.filter(col("n_admitted") > 20).count()
    assert(over == 0)
    assert(streamed.filter(col("n_seen") > 20 && col("n_admitted") =!= 20).count() == 0)
  }
}
