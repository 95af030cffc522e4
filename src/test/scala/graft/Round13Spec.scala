package graft

import graft.operators.Graph
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Round-6 batch-5 specs: item-item Jaccard (G5) and boilerplate
  * removal (X29).
  *
  * Both are DuckDB-oracled for values; what the oracle cannot see is
  * pinned here — the hand-graph arithmetic and degree-cap semantics of
  * the Jaccard candidates, and that the cleaner actually removes the
  * injected template sentences while leaving clean documents intact.
  */
class Round13Spec extends SparkSpec {

  test("g_jaccard: hand bipartite graph matches exact set arithmetic") {
    import spark.implicits._
    // P(1)={10,11,12}, P(2)={10,11,12,13}, P(3)={13}, P(4)={99}
    val sp = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L),
      (3L, 13L), (4L, 99L)).toDF("s", "p")
    val out = Graph.jaccardPairsOf(sp, maxFeatureDeg = 50, topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out((1L, 2L)) == 750000L) // 3/4
    assert(out((2L, 3L)) == 250000L) // 1/4
    assert(!out.contains((1L, 3L)) && !out.contains((1L, 4L)),
      "pairs with empty intersections must not appear")
  }

  test("g_jaccard: a hub feature above the cap contributes neither candidates nor set mass") {
    import spark.implicits._
    // feature 50 is shared by everyone (degree 3 > cap 2) — with it
    // capped away, only {1,2} intersect (on 10), and set sizes shrink
    val sp = Seq(
      (1L, 10L), (1L, 50L), (2L, 10L), (2L, 50L), (3L, 50L), (3L, 11L))
      .toDF("s", "p")
    val rows = Graph.jaccardPairsOf(sp, maxFeatureDeg = 2, topK = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1000000L,
      s"capped universe J(1,2) must be 1/1, got $r")
  }

  test("g_jaccard: candidate generation plans no cartesian join") {
    val plan = Graph.jaccardPairs(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected equi-join candidate generation only:\n$plan")
  }

  test("text_boilerplate: injected template sentences are dropped from every 7th doc") {
    val out = TextQueries.textBoilerplate(spark, sfDir).collect()
    val byDoc = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val injected = byDoc.filter { case (id, _) => id % 7 == 0 }
    assert(injected.nonEmpty)
    // withBoilerplate appends 2 sentences; both exceed the 10%
    // per-source document-frequency threshold at any SF
    assert(injected.forall { case (_, (_, dropped)) => dropped >= 2L },
      "every injected doc must lose at least the 2 template sentences")
  }

  test("text_boilerplate: a clean doc's fingerprint equals its reassembled text") {
    val out = TextQueries.textBoilerplate(spark, sfDir)
    // clean docs (nothing dropped) must fingerprint to md5 of the
    // original sentence reassembly — the cleaner is a no-op for them
    val clean = out.filter(col("n_dropped") === 0).limit(5).collect()
    assert(clean.nonEmpty)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id").isin(clean.map(_.getLong(0)): _*))
      .select(col("doc_id"),
        md5(array_join(filter(transform(split(col("text"), "\\.\\s+"),
          s => trim(s)), s => length(s) > 0), ". ")).as("expect_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    clean.foreach { r =>
      assert(r.getString(3) == docs(r.getLong(0)),
        s"doc ${r.getLong(0)}: cleaner altered a doc with nothing to drop")
    }
  }

  test("ts_residual_anomaly: a weekday-shaped series flags only the planted spike") {
    import spark.implicits._
    // 28 days with a weekly shape (level depends on dow) + small noise;
    // day 17 is a 10× spike. A plain z-score would also flag every
    // high-dow day; the DOW-median removal must leave only the spike.
    val rows = (0 until 28).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i))
      val dowLevel = 1000L + (i % 7) * 500L
      val noise = (i % 3) * 10L
      val y = if (i == 17) 20000L else dowLevel + noise
      (d, y)
    }
    val out = queries.TimeSeries.residualAnomalyOf(rows.toDF("d", "y")).collect()
    val flagged = out.filter(_.getBoolean(6)).map(_.getDate(0).toString)
    assert(flagged.toSeq == Seq("1995-01-18"), s"flagged=$flagged")
    // residual of an un-spiked day stays within the noise band (the
    // i%3 noise cycle spans 0..20 around each dow's median)
    assert(out.filter(!_.getBoolean(6)).forall(r => math.abs(r.getLong(4)) <= 20L))
  }

  test("dedup_quarantine: actions are consistent per cluster and conserve the corpus") {
    val out = operators.Dedup.clusterQuarantine(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(out.length.toLong == nDocs, "every document must receive an action")
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val size = members.head.getLong(2)
      assert(members.forall(_.getLong(2) == size))
      assert(members.length.toLong == size, s"cluster $cid size mismatch")
      val actions = members.map(_.getString(3)).toSeq
      if (size >= 4)
        assert(actions.forall(_ == "quarantine"), s"cluster $cid: $actions")
      else if (size > 1) {
        assert(actions.count(_ == "keep") == 1 && actions.count(_ == "drop") == size - 1)
        // the keeper is the min-id member (= the cluster id)
        val keeper = members.find(_.getString(3) == "keep").get.getLong(0)
        assert(keeper == cid && keeper == members.map(_.getLong(0)).min)
      } else assert(actions == Seq("keep"))
    }
    assert(byCluster.exists(_._2.head.getLong(2) > 1L),
      "testdata must contain at least one real near-dup cluster")
  }

  test("emb_mmr matches a driver-side greedy replay exactly") {
    val (k, short, lam) = (8, 32, 70)
    val out = operators.Similarity
      .embMmr(spark, sfDir, k = k, shortlist = short, lambdaPct = lam)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay with the native cosine's exact accumulation order
    // (left-to-right float-to-double, dot/(√na·√nb)) and Spark's
    // truncating integral `div`
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def simMicro(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val (x, y) = (a(i).toDouble, b(i).toDouble)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      math.round(cos * 1e6)
    }
    val (qId, qEmb) = vecs.head
    val rel = vecs.collect { case (id, v) if id != qId => (id, simMicro(v, qEmb), v) }
      .sortBy { case (id, s, _) => (-s, id) }.take(short)
    var remaining = rel.map { case (id, s, v) => id -> ((s, v)) }.toMap
    val firstId = remaining.toSeq.maxBy { case (id, (s, _)) => (s, -id) }._1
    var expect = List((1, firstId, remaining(firstId)._1, remaining(firstId)._1))
    var maxSel = (remaining - firstId).map { case (id, (_, v)) =>
      id -> simMicro(v, remaining(firstId)._2) }
    remaining -= firstId
    for (r <- 2 to k) {
      val best = remaining.toSeq.maxBy { case (id, (s, _)) =>
        ((lam * s - (100 - lam) * maxSel(id)) / 100, -id) }._1
      val score = (lam * remaining(best)._1 - (100 - lam) * maxSel(best)) / 100
      expect ::= ((r, best, remaining(best)._1, score))
      val bv = remaining(best)._2
      remaining -= best; maxSel -= best
      maxSel = maxSel.map { case (id, m) =>
        id -> math.max(m, simMicro(remaining(id)._2, bv)) }
    }
    RecallLog.record("emb_mmr", "greedy_replay_exact_match",
      if (out.toSeq == expect.reverse) 1.0 else 0.0)
    assert(out.toSeq == expect.reverse,
      s"mmr ${out.toSeq} != greedy replay ${expect.reverse}")
    assert(out.map(_._2).distinct.length == k)
  }

  test("e_seq_pattern: one per-user shuffle, complete pattern rows, sane rates") {
    val df = queries.Analytics.eSeqPattern(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("browse_to_buy", "error_then_churn", "retry_loop"))
    val nUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) == nUsers, "every pattern evaluates over all users")
      assert(r.getLong(1) >= 0L && r.getLong(1) <= nUsers)
      assert(r.getLong(3) == 1000000L * r.getLong(1) / nUsers)
    }
    // the symbol encoding must collapse BEFORE the collect: exactly
    // one wide exchange on user_id feeds the sequence assembly
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // count only the final plan section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1, s"expected one user_id exchange, got $exchanges\n$plan")
  }

  test("g_sssp: a cheap 2-hop path beats an expensive direct edge; unreachables drop") {
    import spark.implicits._
    // 1→2 (10), 2→3 (10), 1→3 (100); node 9 only reaches 10 — from
    // source 1 (the min id), node 3 must cost 20, nodes 9/10 ∞
    val w = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L), (9L, 10L, 5L))
      .toDF("src", "dst", "w")
    val out = Graph.ssspOf(w, iters = 6, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 10L, 3L -> 20L),
      s"got $out") // 9 and 10 are unreachable from 1 and must not appear
  }

  test("ts_acf: a period-7 series has its ACF peak exactly at lag 7") {
    import spark.implicits._
    val rows = (0 until 56).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i)),
        if (i % 7 == 0) 10000L else 100L)
    }
    val acf = queries.TimeSeries.acfOf(rows.toDF("d", "y"), maxLag = 14)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(acf.size == 14)
    // the biased estimator caps a perfect period-7 signal at (n−k)/n
    // — 49/56 = 0.875 at lag 7 — so "near 1" means near that ceiling
    assert(acf(7) > 800000L, s"lag-7 autocorrelation ${acf(7)} not near (n-7)/n")
    assert(acf(14) > 700000L)
    (1 to 6).foreach(k => assert(acf(k) < acf(7), s"lag $k >= lag 7"))
  }

  test("dedup_cdc: chunking re-synchronizes after a front insertion") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog while seventeen " +
      "astronomers catalogued variable stars above the northern " +
      "observatory and the archivist recorded every plate number in the " +
      "leather ledger before dawn broke across the valley floor") * 2
    val docs = Seq((1L, base), (2L, "X" + base)).toDF("doc_id", "text")
    val chunks = operators.Dedup.cdcChunksOf(docs, w = 16, mask = 64)
      .collect().groupBy(_.getLong(0))
    val h1 = chunks(1L).map(_.getString(1)).toSet
    val h2 = chunks(2L).map(_.getString(1)).toSet
    assert(h1.size >= 3, s"base doc produced only ${h1.size} chunks — boundary rule too sparse")
    val shared = (h1 intersect h2).size.toDouble / h1.size
    // a 1-char front insertion perturbs only chunks before the first
    // content-defined boundary; a fixed-stride chunker shares ZERO
    assert(shared >= 0.6, s"only ${(shared * 100).round}% of chunks survived the shift")
  }

  test("ann_hamming: distances agree with an explicit sign-bit popcount replay") {
    val out = operators.Similarity.hammingAnn(spark, sfDir, k = 5, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.indices.count(i => (a(i) > 0f) != (b(i) > 0f)).toLong
    out.foreach { case (q, _, v, d) =>
      assert(d == ham(vecs(q), vecs(v)), s"q=$q v=$v: $d != replay")
    }
    // per query: ranked distances are non-decreasing and no
    // non-selected vector beats the worst selected one
    out.groupBy(_._1).foreach { case (q, rows) =>
      val ds = rows.sortBy(_._2).map(_._4)
      assert(ds.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      val picked = rows.map(_._3).toSet
      val best = vecs.collect {
        case (id, v) if id != q && !picked.contains(id) => ham(vecs(q), v) }.min
      assert(best >= ds.max, s"q=$q: an unselected vector (d=$best) beats the top-k tail")
    }
  }

  test("text_transfer: each target's own model is its strict row minimum") {
    val rows = queries.TextQueries.textTransfer(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val srcs = rows.keys.map(_._1).toSeq.distinct
    assert(rows.size == srcs.length * srcs.length, "matrix must be complete")
    srcs.foreach { t =>
      val diag = rows((t, t))
      srcs.filter(_ != t).foreach { m =>
        assert(diag < rows((m, t)),
          s"model $m scores target $t no worse than its own model")
      }
    }
  }
}
