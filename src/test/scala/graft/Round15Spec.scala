package graft

import org.apache.spark.sql.functions._
import graft.queries.IOQueries
import graft.sinks.ManifestStore

/** Round-7 additions: K19 write-side schema evolution through the
  * manifest commit (and its contracts the DuckDB oracle can't see),
  * plus the E30 streaming twin.
  */
class Round15Spec extends SparkSpec {

  test("sink_schema_evolve: old files carry by reference, old versions stay pinned") {
    val base = java.nio.file.Files.createTempDirectory("evolve_pin").toString
    IOQueries.sinkSchemaEvolve(spark, sfDir, baseOverride = Some(base)).collect()
    val man = base + "/manifest"
    val vs = ManifestStore.versions(spark, man)
    assert(vs == Seq(1L, 2L), s"expected exactly two committed versions, got $vs")
    def rowsOf(v: Long) = spark.read.json(s"$man/manifest_v$v")
      .select("file", "schema_version", "ddl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val v1 = rowsOf(1L)
    val v2 = rowsOf(2L)
    // no rewrite: every v1 file appears verbatim in v2 (carried by
    // reference, schema_version/ddl intact)
    val v2map = v2.map(t => t._1 -> t).toMap
    v1.foreach { t =>
      assert(v2map.get(t._1).contains(t), s"v1 file ${t._1} not carried intact")
    }
    assert(v2.length > v1.length, "v2 must add the new batch's files")
    // schema versions: v1 all schema 1; v2 contains both 1 and 2
    assert(v1.forall(_._2 == 1L))
    assert(v2.map(_._2).toSet == Set(1L, 2L))
    // a reader PINNED to v1 (K9's contract) sees the pre-evolution
    // schema — no channel column — and exactly the batch-1 rows
    val v1Ddl = v1.head._3
    assert(!v1Ddl.contains("channel"), s"v1 ddl leaked the evolved column: $v1Ddl")
    val pinned = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(v1Ddl))
      .parquet(v1.map(_._1): _*)
    assert(!pinned.columns.contains("channel"))
    val expectB1 = graft.Tables.load(spark, sfDir, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM") < "1997-01").count()
    assert(pinned.count() == expectB1)
  }

  test("sink_schema_evolve: a type-conflicting batch is rejected and publishes nothing") {
    val base = java.nio.file.Files.createTempDirectory("evolve_reject").toString
    val man = base + "/manifest"
    val orders = graft.Tables.load(spark, sfDir, "orders")
    IOQueries.evolveAppend(spark, base + "/lake/b1", man,
      orders.select("o_orderkey", "o_totalprice").limit(100))
    val before = ManifestStore.versions(spark, man)
    // same column name, different type: must fail BEFORE any commit
    val ex = intercept[IllegalArgumentException] {
      IOQueries.evolveAppend(spark, base + "/lake/bad", man,
        orders.select(col("o_orderkey"),
          col("o_totalprice").cast("string").as("o_totalprice")).limit(100))
    }
    assert(ex.getMessage.contains("type conflicts"))
    assert(ManifestStore.versions(spark, man) == before,
      "a rejected batch must not consume a manifest version")
  }

  test("e_stream_evolve: restart consumes only post-drift files; commits evolve mid-feed") {
    val base = java.nio.file.Files.createTempDirectory("stream_evolve_pin").toString
    val out = graft.streaming.Events.streamEvolve(spark, sfDir, Some(base)).collect()
    assert(out.length == 3, s"expected 3 channel rows, got ${out.length}")
    // exactly-once across the restart: total streamed rows == orders rows
    val totalN = out.map(_.getLong(1)).sum
    assert(totalN == graft.Tables.load(spark, sfDir, "orders").count(),
      "restart duplicated or dropped feed rows")
    // the lake evolved mid-feed: current manifest carries both schema
    // versions, era-1 files still on schema 1 (never rewritten)
    val (_, cur) = ManifestStore.current(spark, base + "/manifest")
    val rows = cur.select("file", "schema_version").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._2).toSet == Set(1L, 2L), s"schema versions: ${rows.map(_._2).toSet}")
    assert(rows.filter(_._2 == 1L).forall(_._1.contains("r1_")),
      "schema-1 files must all come from the pre-drift run")
    assert(rows.filter(_._2 == 2L).forall(_._1.contains("r2_")),
      "schema-2 files must all come from the post-drift run")
    // several atomic commits per run (maxFilesPerTrigger=1, 2 files/era)
    assert(ManifestStore.versions(spark, base + "/manifest").size >= 4)
  }

  test("dynamic partition overwrite replaces only the re-landed partition's files") {
    val base = java.nio.file.Files.createTempDirectory("dyn_pin").toString
    val lake = base + "/lake"
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .select("month", "o_orderkey", "o_totalprice")
    orders.write.mode("overwrite").partitionBy("month").parquet(lake)
    def listing(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(lake)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("month="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet).toMap
    }
    val before = listing()
    assert(before.size > 1, "need several partitions for the test to mean anything")
    val fix = before.keys.min
    Thread.sleep(1100) // distinct mtimes even on coarse filesystems
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(conf)
    spark.conf.set(conf, "dynamic")
    try orders.filter(concat(lit("month="), col("month")) === fix)
      .withColumn("o_totalprice", round(col("o_totalprice") + 10.0, 2))
      .write.mode("overwrite").partitionBy("month").parquet(lake)
    finally saved match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
    val after = listing()
    assert(after.keySet == before.keySet, "partition set must not change")
    (before.keySet - fix).foreach { m =>
      assert(after(m) == before(m), s"untouched partition $m was rewritten")
    }
    assert(after(fix) != before(fix), s"re-landed partition $fix kept its old files")
  }

  test("dedup_containment: candidate volume obeys the df-cap law at the 10x step") {
    import graft.operators.Dedup
    val scaled = Bench.ensureScaled(spark, sfDir, 10)
    for (d <- Seq(sfDir, scaled)) {
      val kept = Dedup.containmentKeptIndex(spark, d)._2.count()
      val cand = Dedup.containmentCandidates(spark, d)._2.count()
      // distinct pairs <= pre-dedup candidate rows <= (maxDf-1) * kept
      assert(cand <= 49L * kept,
        s"$d: $cand candidates exceed the df-cap bound ${49L * kept}")
      RecallLog.record("dedup_containment",
        if (d == sfDir) "cand_per_index_row_1x" else "cand_per_index_row_10x",
        cand.toDouble / math.max(kept, 1L))
    }
  }

  test("g_adamic_adar: wedge volume obeys the hub-cap law at the 10x step") {
    import graft.operators.Graph
    val scaled = Bench.ensureScaled(spark, sfDir, 10)
    for (d <- Seq(sfDir, scaled)) {
      val (cappedEdges, wedges) = Graph.adamicAdarStats(spark, d)
      assert(wedges <= 49L * cappedEdges,
        s"$d: $wedges wedges exceed the cap bound ${49L * cappedEdges}")
      RecallLog.record("g_adamic_adar",
        if (d == sfDir) "wedges_per_edge_1x" else "wedges_per_edge_10x",
        wedges.toDouble / math.max(cappedEdges, 1L))
    }
  }

  test("cdc boundaries use codepoint positions: emoji do not shift the cut points") {
    import spark.implicits._
    import org.apache.spark.sql.graft.{CdcBoundaries, ColumnShim}
    // two strings identical except a supplementary-plane char (2 UTF-16
    // code units, 1 codepoint) replaces a BMP char at the front: with
    // codepoint semantics, boundary POSITIONS after the substitution
    // depend only on codepoint values, and a driver-side codepoint
    // replay must agree exactly — the round-6 UTF-16 form shifted every
    // downstream cut by one on such input (ADVICE r6 finding)
    val w = 16
    val mask = 64
    val body = "the quick brown fox jumps over the lazy dog " * 8
    val texts = Seq("a" + body, "😀" + body) // 😀
    def replay(t: String): Seq[Int] = {
      val cps = t.codePoints().toArray
      val M = 1048576L
      var top = 1L
      (1 until w).foreach(_ => top = (top * 31L) & (M - 1))
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var h = 0L
      cps.indices.foreach { i =>
        h = if (i < w) (h * 31L + cps(i)) & (M - 1)
            else ((h - cps(i - w) * top) * 31L + cps(i)) & (M - 1)
        if (i >= w - 1 && h % mask == 0) out += i + 1
      }
      out.toSeq
    }
    val got = texts.toDF("text")
      .select(ColumnShim.column(
        CdcBoundaries(ColumnShim.expression(col("text")), w, mask)).as("b"))
      .collect().map(_.getSeq[Int](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == replay(t), s"boundaries diverge from codepoint replay for ${t.take(8)}")
    }
    assert(got(0).nonEmpty, "test corpus must actually produce boundaries")
  }

  test("ann_ivf_sweep: recall is monotone in nprobe and the top setting clears 0.85") {
    val out = graft.operators.Similarity.ivfSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(2, 4, 6, 8))
    out.foreach { case (np, rec) =>
      RecallLog.record("ann_ivf_sweep", s"recall_nprobe_$np", rec / 1e6)
    }
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._2 <= p(1)._2),
      s"recall not monotone in nprobe: ${out.toSeq}")
    assert(out.last._2 >= 850000L, s"nprobe=8 recall ${out.last._2} below 0.85")
  }

  test("sink_clone: the clone step writes zero data files and the source never changes") {
    val base = java.nio.file.Files.createTempDirectory("clone_pin").toString
    graft.queries.IOQueries.sinkClone(spark, sfDir, baseOverride = Some(base)).collect()
    def files(man: String, v: Long) = spark.read.json(s"$man/manifest_v$v")
      .select("file").collect().map(_.getString(0)).toSet
    val srcV = ManifestStore.versions(spark, base + "/src_manifest")
    assert(srcV == Seq(1L), s"source must never re-publish: $srcV")
    val src = files(base + "/src_manifest", 1L)
    val cloneV1 = files(base + "/clone_manifest", 1L)
    // zero-copy: clone v1 IS the source file set, by reference
    assert(cloneV1 == src, "clone v1 must reference exactly the source files")
    assert(!cloneV1.exists(_.contains("clone_lake")),
      "the clone step must not write any data file")
    // divergence: clone v2 adds its own files; the source set is intact
    val cloneV2 = files(base + "/clone_manifest", 2L)
    assert(src.subsetOf(cloneV2) && (cloneV2 -- src).nonEmpty)
    assert((cloneV2 -- src).forall(_.contains("clone_lake")),
      "diverged files must live under the clone's own lake")
  }

  test("sink_optimize: fragments leave v2, healthy files carry verbatim, v1 still readable") {
    val base = java.nio.file.Files.createTempDirectory("optimize_pin").toString
    graft.queries.IOQueries.sinkOptimize(spark, sfDir, baseOverride = Some(base)).collect()
    val man = base + "/manifest"
    def rowsOf(v: Long) = spark.read.json(s"$man/manifest_v$v")
      .select("file", "n_rows").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val v1 = rowsOf(1L)
    val v2 = rowsOf(2L)
    assert(v2.length < v1.length, s"optimize must shrink the file count: ${v1.length} -> ${v2.length}")
    // healthy files carried verbatim; fragments absent from v2
    val healthy = v1.filter(_._2 >= 500L).toSet
    val frags = v1.filter(_._2 < 500L)
    assert(frags.nonEmpty && healthy.nonEmpty, "demo must plant both populations")
    assert(healthy.subsetOf(v2.toSet), "healthy files must carry by reference")
    assert(!v2.exists(f => frags.exists(_._1 == f._1)), "fragments must leave v2")
    // compacted row mass equals the fragment mass (nothing lost)
    val compacted = v2.toSet -- healthy
    assert(compacted.toSeq.map(_._2).sum == frags.map(_._2).sum)
    // a v1-pinned reader still works: every v1 file is alive on disk
    val total1 = spark.read.parquet(v1.map(_._1): _*).count()
    assert(total1 == v1.map(_._2).sum)
  }

  test("round-7 plan shapes: no cartesian anywhere, top-K distributed, probes broadcast") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val aa = plan(graft.operators.Graph.adamicAdar(spark, sfDir))
    assert(!aa.contains("CartesianProduct") && !aa.contains("BroadcastNestedLoop"),
      "adamic-adar candidates must come from the wedge equi-join")
    assert(aa.contains("TakeOrderedAndProject"), "adamic-adar top-K must distribute")
    val cont = plan(graft.operators.Dedup.containment(spark, sfDir))
    assert(!cont.contains("CartesianProduct") && !cont.contains("BroadcastNestedLoop"),
      "containment candidates must come from the capped inverted-index equi-join")
    val streaks = plan(graft.queries.Analytics.qStreaks(spark, sfDir))
    assert(streaks.contains("TakeOrderedAndProject"), "streak top-K must distribute")
    val ivfpq = plan(graft.operators.Similarity.ivfpqAnn(spark, sfDir))
    assert(!ivfpq.contains("CartesianProduct") && !ivfpq.contains("BroadcastNestedLoop"),
      "ivfpq probe must be an equi-join on cell")
    assert(ivfpq.contains("BroadcastHashJoin"), "probe side must broadcast")
  }

  test("g_adamic_adar: hand graph scores and ordering match the closed form") {
    import spark.implicits._
    // parts as intermediaries: part 10 bought by {1,2} (deg 2), part 20
    // by {1,2,3} (deg 3), part 30 by {3} alone (deg 1 -> excluded).
    // w(10) = floor(1e6/ln2 + .5) = 1442695, w(20) = floor(1e6/ln3 + .5)
    // = 910239. AA(1,2) = w10 + w20; AA(1,3) = AA(2,3) = w20; the tie
    // breaks on (a, b).
    val cs = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L), (3L, 20L), (3L, 30L))
      .toDF("c", "s")
    val out = graft.operators.Graph.adamicAdarOf(cs, maxDeg = 50, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1442695L + 910239L),
      (1L, 3L, 1L, 910239L),
      (2L, 3L, 1L, 910239L)), s"got ${out.toSeq}")
  }

  test("g_adamic_adar: the hub cap drops commodity intermediaries, not the scores of survivors") {
    import spark.implicits._
    // one rare part {1,2} plus a hub part bought by everyone: with the
    // cap below the hub degree, pairs connected ONLY through the hub
    // vanish while the rare-part pair keeps its exact rare-part term
    val hub = (1L to 10L).map(c => (c, 99L))
    val cs = (Seq((1L, 10L), (2L, 10L)) ++ hub).toDF("c", "s")
    val capped = graft.operators.Graph.adamicAdarOf(cs, maxDeg = 5, topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(capped.toSeq == Seq((1L, 2L, 1442695L)), s"got ${capped.toSeq}")
  }

  test("ts_mann_kendall: pre-epoch dates land in the same weekday bucket (floor-mod dow)") {
    import spark.implicits._
    import java.sql.Date
    // a weekly series STRADDLING the fixed epoch: signed % would split
    // this one weekday into two disjoint sub-series (dow -6..0 vs 0..6)
    // and hide any trend spanning the epoch (review r7 finding); with
    // floor-mod the output has exactly ONE row and sees the full trend
    val series = (-10 to 9).map { i =>
      (Date.valueOf(java.time.LocalDate.parse("1995-01-01").plusDays(7L * i)),
        (i + 11L) * 1000000L)
    }.toDF("d", "y")
    val out = graft.queries.TimeSeries.mannKendallOf(series).collect()
    assert(out.length == 1, s"epoch-straddling weekday split into ${out.length} buckets")
    assert(out.head.getAs[String]("trend") == "increasing")
    assert(out.head.getAs[Long]("n") == 20L)
  }

  test("ts_mann_kendall: monotone series flag, constant series stay quiet, outliers cannot flip") {
    import spark.implicits._
    import java.sql.Date
    def series(ys: Seq[Long]): org.apache.spark.sql.DataFrame =
      ys.zipWithIndex.map { case (y, i) =>
        // stay on ONE weekday so the seasonal split leaves one sub-series
        (Date.valueOf(java.time.LocalDate.parse("1995-01-01").plusDays(7L * i)), y)
      }.toDF("d", "y")
    def verdict(ys: Seq[Long]): (String, Long) = {
      val r = graft.queries.TimeSeries.mannKendallOf(series(ys)).collect()
      assert(r.length == 1)
      (r.head.getAs[String]("trend"), r.head.getAs[Long]("s"))
    }
    val up = (1L to 20L).map(_ * 1000000L)
    assert(verdict(up) == (("increasing", 190L))) // S = C(20,2), z well past 1.96
    assert(verdict(up.reverse)._1 == "decreasing")
    val flat = Seq.fill(20)(5000000L)
    val (t, s0) = verdict(flat)
    assert(t == "no_trend" && s0 == 0L, "all-tied series must be var18<=0, z=0")
    // robustness: one wild outlier shifts S by at most 2(n-1) of C(n,2)
    // pair signs — the monotone verdict cannot flip (the F8 argument
    // applied to DETECTION)
    val spiked = up.updated(10, 999999999999L)
    assert(verdict(spiked)._1 == "increasing")
  }

  test("text_zipf: a planted power-law corpus fits slope -1 with r2 ~ 1") {
    import spark.implicits._
    // term i repeated floor(1000/i) times, i = 1..50: exact Zipf with
    // s = 1 up to floor dust -> the fit must recover slope ~ -1, r2 ~ 1.
    // The committed registry run records the honest finding on the
    // SYNTHETIC corpus: 31 types, slope -0.18, r2 0.06 -- template
    // generation is NOT Zipfian, which is what the diagnostic is FOR.
    val text = (1 to 50).flatMap(i => Seq.fill(1000 / i)(f"w$i%03d")).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("zipf_spec").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.queries.TextQueries.textZipf(spark, tmp).collect().head
    val slope = r.getLong(1)
    val r2 = r.getLong(2)
    assert(r.getLong(0) == 50L)
    assert(slope > -1100000L && slope < -900000L, s"slope_micro=$slope not ~ -1e6")
    assert(r2 > 990000L, s"r2_micro=$r2 not ~ 1e6")
  }

  test("t_purged_folds: driver replay of the fold geometry matches, leakage halo is train-free") {
    val out = graft.queries.Analytics.tPurgedFolds(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    // independent replay: label every order date in plain Scala with
    // the same integer-day arithmetic, then compare per-(fold, split)
    // counts — stronger than geometry spot-checks (and the halo being
    // train-free holds BY REPLAY: a train label inside the halo would
    // shift a count)
    val dates = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date")).collect().map(_.getDate(0).toLocalDate)
    val dmin = dates.min
    val span = java.time.temporal.ChronoUnit.DAYS.between(dmin, dates.max) + 1
    val expected = scala.collection.mutable.Map.empty[(Int, String), Long].withDefaultValue(0L)
    for (d <- dates; f <- 0 until 5) {
      val x = java.time.temporal.ChronoUnit.DAYS.between(dmin, d)
      val ts = f * span / 5
      val te = (f + 1) * span / 5
      val split =
        if (x >= ts && x < te) "3_test"
        else if (x >= ts - 7 && x < ts) "2_purged"
        else if (x >= te && x < te + 7) "4_embargo"
        else "1_train"
      expected((f, split)) += 1L
    }
    assert(out == expected.toMap, s"diff: ${(out.toSet diff expected.toSet) ++ (expected.toSet diff out.toSet)}")
    // and each fold's splits partition the table
    (0 until 5).foreach { f =>
      assert(out.collect { case ((`f`, _), c) => c }.sum == dates.length.toLong)
    }
  }

  test("evolveAppend: identical and subset schemas do not bump the schema version") {
    val base = java.nio.file.Files.createTempDirectory("evolve_stable").toString
    val man = base + "/manifest"
    val orders = graft.Tables.load(spark, sfDir, "orders")
    IOQueries.evolveAppend(spark, base + "/lake/b1", man,
      orders.select("o_orderkey", "o_totalprice").limit(100))
    IOQueries.evolveAppend(spark, base + "/lake/b2", man,
      orders.select("o_orderkey", "o_totalprice").limit(50))
    // a batch MISSING a lake column is additive-compatible: no bump,
    // the evolved-schema read null-fills it
    IOQueries.evolveAppend(spark, base + "/lake/b3", man,
      orders.select("o_orderkey").limit(10))
    val (_, cur) = ManifestStore.current(spark, man)
    assert(cur.select("schema_version").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("dedup_containment: bound-prefiltered verify ≡ verify-every-candidate on a hot-shingle corpus") {
    // The r14 optimization counts capped-intersections in the candidate
    // join and prefilters with capped_inter + min(nhot_a, nhot_b) >=
    // t·sza before the exact verify. The testdata corpus never exceeds
    // the df cap (max df 25 < 50), so the hot-shingle term of the bound
    // is exercised HERE: a corpus where the boilerplate shingles are
    // hot (df > maxDf) and a contained pair needs those hot shingles to
    // reach the threshold — a bound that ignored nhot would silently
    // drop the pair.
    import graft.operators.Dedup
    import spark.implicits._
    val boiler = "alpha beta gamma delta"
    val docs =
      Seq(
        (1L, s"$boiler uniq1a uniq1b uniq1c"),
        // doc 2 extends doc 1: C(1→2) = 1.0, but doc 1's kept (rare)
        // shingles alone give only 3/5 = 0.6 < 0.8 — the verify must
        // count the hot boilerplate shingles to admit the pair
        (2L, s"$boiler uniq1a uniq1b uniq1c extra2a extra2b"),
        // partial overlap well under the threshold — bound-rejected
        (9L, "p q r s t u"),
        (10L, "p q r x y z w v")
      ) ++ (3L to 8L).map(i => (i, s"$boiler junk${i}a junk${i}b"))
    val tmp = java.nio.file.Files.createTempDirectory("contain_hot").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val maxDf = 3; val t = 0.8; val n = 3

    // reference: the pre-r14 shape — every capped-index candidate
    // exact-verified from the full hashed sets
    val sets = spark.read.parquet(s"$tmp/documents.parquet")
      .select(col("doc_id"), Dedup.shingleHashesCol(col("text"), n).as("sh"))
    val idx = sets.select(col("doc_id"), explode(col("sh")).as("h"))
    val dfs = idx.groupBy("h").agg(count(lit(1)).as("df"))
    assert(dfs.filter(col("df") > maxDf).count() > 0,
      "corpus must actually contain hot shingles for this test to bite")
    val kept = idx.join(dfs.filter(col("df") <= maxDf), "h")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
      .distinct()
    val expected = cand
      .join(sets.select(col("doc_id").as("inner_id"), col("sh").as("sha")), Seq("inner_id"))
      .join(sets.select(col("doc_id").as("outer_id"), col("sh").as("shb")), Seq("outer_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("containment", round(col("inter").cast("double") / size(col("sha")), 4))
      .filter(col("containment") >= t)
      .select("inner_id", "outer_id", "containment")
      .orderBy("inner_id", "outer_id")
      .collect().map(_.toString)

    val got = Dedup.containment(spark, tmp, t, n, maxDf)
      .collect().map(_.toString)
    assert(got.sameElements(expected),
      s"bound-verify diverged: got ${got.mkString(",")} expected ${expected.mkString(",")}")
    // the hot-branch witness: (1 → 2) is only reachable through nhot
    assert(got.exists(_.startsWith("[1,2,")),
      s"contained pair (1→2) missing — hot-shingle term of the bound not applied: ${got.mkString(",")}")
  }
}
