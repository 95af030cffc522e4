package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Round-6 late specs: the domain-cap curation sampler.
  *
  * text_domain_cap's oracle is a window (`row_number() <= cap`), but
  * the Spark plan must NOT be one — a window shuffles and sorts every
  * corpus row into its domain's reducer, and the mega-domain the cap
  * exists for becomes the straggler. These specs pin (a) the exact
  * keeper-set semantics vs a driver replay of the hash order and (b)
  * the plan shape: a bounded partial-aggregable top-k, no Window/Sort
  * over the corpus scan.
  */
class Round11Spec extends SparkSpec {

  test("text_domain_cap: keeper set matches a driver replay of the hash order") {
    val cap = 15
    val out = TextQueries.textDomainCap(spark, sfDir, cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySource = docs.groupBy(_._1)
    // replay: per source, sort by (knuth-hash, doc_id), take cap
    val expected = bySource.toSeq.flatMap { case (src, rows) =>
      rows.map(_._2)
        .sortBy(id => (java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L), id))
        .take(cap).zipWithIndex
        .map { case (id, i) => (src, id, i + 1L, rows.length.toLong) }
    }.toSet
    assert(out.toSet == expected, "kept (source, doc_id, rank, n_source) must replay exactly")
    // ranks dense from 1, at most cap per source, totals honest
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"$src ranks dense")
      assert(rows.length <= cap, s"$src exceeds cap")
      assert(rows.length == math.min(cap, bySource(src).length), s"$src keeps min(n, cap)")
    }
  }

  test("text_phrase: counts match a driver scan, overlapping occurrences included") {
    val out = TextQueries.textPhrase(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getString(1), r.getLong(3)))).toMap
    val phrases = Seq((0L, "window batch"), (1L, "batch batch batch"),
      (2L, "spark table small"), (3L, "data row column"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver replay: normalize exactly like normToks, count every
    // anchor where the token window equals the phrase (overlaps count)
    val expected = for {
      (docId, text) <- docs
      toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ", -1).filter(_.nonEmpty).toSeq
      (pid, p) <- phrases
      pt = p.split(' ').toSeq
      n = (0 to toks.length - pt.length).count(a => toks.slice(a, a + pt.length) == pt)
      if n > 0
    } yield (pid, docId) -> (p, n.toLong)
    assert(out == expected.toMap, "per-doc phrase occurrence counts must replay exactly")
    assert(out.nonEmpty, "phrase set must actually hit the corpus")
  }

  test("text_phrase: one broadcast slot join + aggregates, no positional self-join chain") {
    val plan = TextQueries.textPhrase(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"adjacency must be the anchor-vote aggregate, not shuffled self-joins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"slot table should broadcast:\n$plan")
  }

  test("t_weighted_sample: selection replays driver-side and overweights long docs") {
    import graft.queries.Relational
    val out = Relational.tWeightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val keyed = docs.map { case (id, w) =>
      val h = java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L)
      val u = (h + 0.5) / 4294967296.0
      (id, w, math.round(-math.log(u) / w * 1e12))
    }
    val expected = keyed.sortBy(e => (e._3, e._1)).take(100)
    assert(out.toSeq == expected.toSeq,
      "Efraimidis–Spirakis selection must replay exactly driver-side")
    // inclusion probability ∝ weight: the sample's mean length must
    // exceed the corpus mean (deterministic given the fixed hash)
    val sampleMean = out.map(_._2).sum.toDouble / out.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      f"weighted sample mean w $sampleMean%.1f should exceed corpus mean $corpusMean%.1f")
  }

  test("t_weighted_sample: plans a bounded per-partition top-k, no global sort or window") {
    import graft.queries.Relational
    val plan = Relational.tWeightedSample(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global k smallest keys should be TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Window"), s"no window over the corpus:\n$plan")
  }

  test("ts_ewma: hand-series replay, warm-up renormalization, geometric decay") {
    import graft.queries.TimeSeries
    import spark.implicits._
    val ys = Seq(100L, 200L, 50L, 400L, 300L, 250L, 150L, 500L)
    val series = ys.zipWithIndex
      .map { case (y, i) => (java.sql.Date.valueOf(f"2020-01-${i + 1}%02d"), y) }
      .toDF("d", "y")
    val out = TimeSeries.ewmaOf(series, lags = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = TimeSeries.ewmaWeights(4) // 64, 48, 36, 27 — ratio 3/4
    val expected = ys.indices.map { t =>
      val lags = (0 until math.min(4, t + 1)).map(j => (ys(t - j), w(j)))
      val num = lags.map { case (y, wt) => BigInt(y) * wt }.sum
      val den = lags.map(_._2).sum
      val e = math.round(num.toDouble / den.toDouble)
      (ys(t), e, ys(t) - e)
    }
    assert(out.toSeq == expected, "EWMA must replay the truncated renormalized form exactly")
    // warm-up: first row has only its own lag → ewma = y
    assert(out.head._2 == ys.head, "first observation smooths to itself")
    // decay sanity: weights are geometric with ratio 3/4, newest largest
    assert(w == w.sorted.reverse && w.zip(w.tail).forall { case (a, b) => a * 3 == b * 4 },
      "weights must decay by exactly 3/4 per lag")
  }

  test("q_winsorize: cuts and robust mean replay driver-side for every group") {
    import graft.queries.Analytics
    val out = Analytics.qWinsorize(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val vals = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 1e6).cast("long").as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    vals.groupBy(_._1).foreach { case (grp, rows) =>
      val vs = rows.map(_._2).sorted
      // percentile_disc: smallest value with cume_dist >= p
      def pd(p: Double) = vs(math.ceil(p * vs.length).toInt.max(1) - 1)
      val (lo, hi) = (pd(0.05), pd(0.95))
      val clamped = vs.map(v => math.min(math.max(v, lo), hi))
      val (n, nLo, nHi, pLo, pHi, mean, wmean) = out(grp)
      assert(n == vs.length && pLo == lo && pHi == hi, s"$grp cuts")
      assert(nLo == vs.count(_ < lo) && nHi == vs.count(_ > hi), s"$grp clamp counts")
      assert(mean == math.round(vs.map(BigInt(_)).sum.toDouble / vs.length), s"$grp mean")
      assert(wmean == math.round(clamped.map(BigInt(_)).sum.toDouble / vs.length),
        s"$grp winsorized mean")
      assert(pLo <= wmean && wmean <= pHi, s"$grp wmean inside the clamp range")
    }
  }

  test("q_assoc_rules: counts consistent, lift symmetric, confidence bounded") {
    import graft.queries.Analytics
    // large topK so symmetry pairs aren't cut mid-pair by the limit
    val rules = Analytics.qAssocRules(spark, sfDir, minCount = 3, topK = 10000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
    assert(rules.nonEmpty, "min-support pairs must exist at this SF")
    val byPair = rules.toMap
    rules.foreach { case ((a, b), (cab, ca, cb, sup, conf, lift)) =>
      assert(cab >= 3 && cab <= math.min(ca, cb), s"($a,$b) count bounds")
      assert(conf <= 1000000L && sup <= conf, s"($a,$b) support <= confidence <= 1")
      val rev = byPair((b, a))
      assert(rev._1 == cab && rev._6 == lift, s"($a,$b) lift must be symmetric")
      assert(rev._2 == cb && rev._3 == ca, s"($a,$b) reversed supports swap")
    }
  }

  test("text_domain_cap: plans a bounded partial top-k aggregate, not a corpus window sort") {
    val plan = TextQueries.textDomainCap(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"domain cap must not shuffle+sort whole domains through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topkbyscore"),
      s"keeper set should be a map-side-capped mergeable aggregate:\n$plan")
  }
}
