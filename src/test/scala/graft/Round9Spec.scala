package graft

import graft.operators.Similarity
import graft.queries.{Analytics, Relational, TextQueries}
import org.apache.spark.sql.functions._

/** Round-5 late additions: BM25 retrieval, k-means clustering, skyline,
  * rolling median, sketch set-overlap.
  */
class Round9Spec extends SparkSpec {

  test("text_bm25: ranks are dense, scores non-increasing, hits contain a query term") {
    val rows = TextQueries.textBm25(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L), "every query returns hits")
    byQuery.foreach { case (q, hits) =>
      val ranked = hits.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length),
        s"query $q ranks must be dense from 1")
      val scores = ranked.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores must be non-increasing")
      assert(scores.forall(_ > 0), s"query $q BM25 scores are positive (Lucene idf form)")
    }
    // the top hit for query 0 ("spark query join") really contains one
    // of its terms — retrieval is grounded in the corpus, not an
    // artifact of the scoring plumbing
    val top0 = byQuery(0L).minBy(_.getInt(1)).getLong(2)
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === top0).select("text").head.getString(0)
    assert(Seq("spark", "query", "join").exists(text.contains),
      s"top hit $top0 for query 0 should contain a query term")
  }

  test("q_skyline: cumulative-min sweep equals brute-force dominance, no corpus nest-loop") {
    val df = Relational.qSkyline(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan a quadratic join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "frontier should broadcast back onto the scan")
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = parts.filter { case (_, s, pr) =>
      !parts.exists { case (_, s2, p2) => s2 <= s && p2 <= pr && (s2 < s || p2 < pr) }
    }.map(_._1).toSet
    val got = df.collect().map(_.getLong(0)).toSet
    assert(got == expected, s"skyline mismatch: extra=${got.diff(expected)} missing=${expected.diff(got)}")
  }

  test("e_stream_asof equals the batch as-of join row-for-row") {
    val stream = graft.streaming.Events.streamAsof(spark, sfDir)
      .select("user_id", "event_id", "purchase_us", "click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val batch = graft.streaming.Events.asofJoin(spark, sfDir)
      .select("user_id", "event_id", "purchase_us", "click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(stream == batch, "streaming as-of must reproduce the batch as-of exactly")
  }

  test("dedup_substring_remove: keeps exactly one occurrence of shared boilerplate") {
    val rows = graft.operators.Dedup.substringRemove(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.forall { case (_, n, rm) => rm >= 0 && rm <= n },
      "removed count must be within [0, n_tokens]")
    assert(rows.map(_._3).sum > 0, "the planted boilerplate must produce removals")
    // every doc_id % 7 == 0 doc shares the appended boilerplate tail;
    // all but the globally-first occurrence lose at least one w-token
    // span (w = 8)
    val boiler = rows.filter(_._1 % 7 == 0)
    val untouched = boiler.count(_._3 == 0)
    assert(untouched <= 1,
      s"at most the keeper may retain the boilerplate span untouched, got $untouched")
    assert(boiler.count(_._3 >= 8) >= boiler.length - 1,
      "non-keeper boilerplate docs lose at least one full span")
  }

  test("t_fuzzy_join: blocked equi-join plan, non-vacuous fuzzy pairs") {
    val df = Analytics.tFuzzyJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"FastSS blocking must plan an equi-join on variants, not all-pairs:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= 1))
    assert(rows.exists(_.getInt(2) == 1),
      "the typo slice must produce at least one true distance-1 pair")
  }

  test("q_overlap_sketch: inclusion-exclusion tracks the exact overlap") {
    val est = Analytics.qOverlapSketch(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    assert(est.nonEmpty)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = events.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    var worst = 0.0
    est.foreach { case ((ta, tb), e) =>
      val exact = byType(ta).intersect(byType(tb)).size
      val err = if (exact == 0) math.abs(e).toDouble
                else math.abs(e - exact).toDouble / exact
      worst = math.max(worst, err)
      assert(err <= 0.15, s"pair ($ta,$tb): est $e vs exact $exact, rel err $err")
    }
    RecallLog.record("q_overlap_sketch", "max_rel_err", worst)
    RecallLog.record("q_overlap_sketch", "n_pairs", est.size.toDouble)
  }

  test("text_pmi: top-K plans as TakeOrderedAndProject, not a global sort") {
    val plan = TextQueries.textPmi(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit should plan a per-partition top-K merge:\n$plan")
  }

  test("text_bm25: rank is the mergeable top-k aggregate, no corpus-wide window") {
    val plan = TextQueries.textBm25(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TopKByScore should aggregate partial map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in BM25:\n$plan")
  }

  // ---- emb_kmeans: exactness vs an independent driver replay ----

  /** HALF_UP micro-rounding with Spark `round`'s BigDecimal semantics
    * (Double.toString-based valueOf, not the raw binary expansion).
    */
  private def microRound(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Replays [[org.apache.spark.sql.graft.NearestCentroids]]'s
    * float-widening cosine argmax exactly: dot accumulates
    * float×double products, ties keep the lowest index.
    */
  private def nearestReplay(v: Array[Float], cent: Seq[Seq[Double]]): Int = {
    val dim = cent.head.length
    val n = math.min(v.length, dim)
    var vNorm = 0.0
    var i = 0
    while (i < n) { val x = v(i).toDouble; vNorm += x * x; i += 1 }
    vNorm = math.sqrt(vNorm)
    val cNorm = cent.map(c => math.sqrt(c.map(x => x * x).sum))
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cent.length) {
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cent(c)(j); j += 1 }
      val s0 = if (vNorm == 0.0 || cNorm(c) == 0.0) 0.0 else dot / (vNorm * cNorm(c))
      val s = if (s0.isNaN) Double.NegativeInfinity else s0
      if (best == -1 || s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** Replays the operator's cosine micro-distance:
    * round((1 − cos)·1e6) with the native expression's left-to-right
    * float-widening accumulation.
    */
  private def distMicro(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      val (x, y) = (a(i).toDouble, b(i).toDouble)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    math.round((1.0 - cos) * 1e6)
  }

  /** Independent replay of [[Similarity.kmeansPlusPlusSeeds]]: seed 1
    * minimizes (xxhash64(vec_id), vec_id); seed j minimizes the
    * exponential key −ln(u_ij)/D_i² with u_ij from xxhash64(vec_id, j)
    * and D_i the incrementally-maintained micro cosine distance to the
    * nearest chosen seed. Hash values are fetched from Spark's
    * xxhash64 (the published draw function); the selection logic —
    * the thing the operator could get wrong — replays in plain Scala.
    */
  private def seedsReplay(allVecs: Array[(Long, Array[Float])], k: Int,
                          sampleN: Int = 4096): Seq[Seq[Double]] = {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val hashCols = col("vec_id").as("id") +: xxhash64(col("vec_id")).as("h0") +:
      (2 to k).map(j => xxhash64(col("vec_id"), lit(j)).as(s"h$j"))
    val hashes = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(hashCols: _*).collect()
      .map(r => r.getLong(0) -> (1 to k).map(j =>
        if (j == 1) r.getLong(1) else r.getLong(j)).toArray).toMap
    // the operator seeds over the lowest-hash sampleN sample (the full
    // corpus at every spec SF — this restriction is live only beyond)
    val vecs = allVecs.sortBy { case (id, _) => (hashes(id)(0), id) }.take(sampleN)
    val first = vecs.minBy { case (id, _) => (hashes(id)(0), id) }
    var chosen = List(first._2)
    val dmin = scala.collection.mutable.Map(
      vecs.map { case (id, v) => id -> distMicro(v, first._2) }: _*)
    for (j <- 2 to k) {
      val (_, pickId, pickVec) = vecs.map { case (id, v) =>
        val d = dmin(id)
        val key =
          if (d == 0L) Double.MaxValue
          else {
            val u = math.max(
              hashes(id)(j - 1).toDouble / math.pow(2, 64) + 0.5, 1e-12)
            -math.log(u) / (d.toDouble * d.toDouble)
          }
        (key, id, v)
      }.minBy(t => (t._1, t._2))
      chosen ::= pickVec
      vecs.foreach { case (id, v) =>
        dmin(id) = math.min(dmin(id), distMicro(v, pickVec)) }
    }
    chosen.reverse.map(_.toSeq.map(_.toDouble))
  }

  private def kmeansReplay(vecs: Array[(Long, Array[Float])], k: Int, iters: Int)
      : Map[Long, Int] = {
    var cent: Seq[Seq[Double]] = seedsReplay(vecs, k)
    for (_ <- 0 until iters) {
      val assigned = vecs.map { case (_, v) => (nearestReplay(v, cent), v) }
      cent = cent.indices.map { c =>
        val members = assigned.filter(_._1 == c).map(_._2)
        if (members.isEmpty) cent(c)
        else {
          val dim = cent(c).length
          (0 until dim).map { j =>
            val s = members.map(v => microRound(v(j).toDouble * 1e6)).sum
            s.toDouble / members.length / 1e6
          }
        }
      }
    }
    vecs.map { case (id, v) => id -> nearestReplay(v, cent) }.toMap
  }

  test("emb_kmeans matches an independent driver replay exactly") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val expected = kmeansReplay(vecs, k = 8, iters = 5)
    val got = Similarity.embKmeans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got.size == expected.size)
    val diff = got.filter { case (id, c) => expected(id) != c }
    assert(diff.isEmpty, s"assignment mismatch for ${diff.size} vectors, e.g. ${diff.take(3)}")
    // clusters are genuinely populated, not one mega-cluster
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.size >= 4, s"expected >=4 non-empty clusters, got ${sizes.size}")
  }

  test("emb_kmeans is invariant under repartitioning") {
    val a = Similarity.embKmeans(spark, sfDir).collect().map(r => (r.getLong(0), r.getInt(2)))
    val b = Similarity.embKmeans(spark, sfDir, repartitionTo = Some(7))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(a.sameElements(b), "micro-rounded long sums must make assignments partitioning-exact")
  }

  test("emb_kmeans: record cluster purity vs generator labels") {
    val rows = Similarity.embKmeans(spark, sfDir).collect()
    val purity = rows.groupBy(_.getInt(2)).values
      .map(g => g.groupBy(_.getInt(1)).values.map(_.size).max).sum.toDouble / rows.length
    // the synthetic embeddings are only weakly label-separated (mean
    // same-label cosine ≈ 0.02 vs ≈ 0.00 across labels), so the honest
    // bar is the majority-label prior, not an absolute purity
    val prior = rows.groupBy(_.getInt(1)).values.map(_.size).max.toDouble / rows.length
    RecallLog.record("emb_kmeans", "purity", purity)
    RecallLog.record("emb_kmeans", "purity_prior", prior)
    RecallLog.record("emb_kmeans", "n_clusters",
      rows.map(_.getInt(2)).distinct.length.toDouble)
    assert(purity > prior,
      s"k-means purity $purity should beat the majority-label prior $prior")
  }
}
