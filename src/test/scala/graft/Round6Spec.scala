package graft

import graft.functions.Aggregators
import graft.operators.Dedup
import graft.queries.{Analytics, TextQueries}
import org.apache.spark.sql.functions._

/** Round-4 batch-2 specs: sketch-prefiltered heavy hitters, the bloom
  * membership gate, DSIR importance scoring, and BPE merge learning.
  */
class Round6Spec extends SparkSpec {

  test("CMS estimates never under-count (the prefilter soundness property)") {
    import spark.implicits._
    val depth = 4; val width = 64
    val keys = (1L to 500L).map(i => i % 37) // skewed small domain
    val rows = keys.toDF("k").select(col("k"),
      array((0 until depth).map(r =>
        pmod(xxhash64(col("k"), lit(r)), lit(width)).cast("int")): _*).as("idx"))
    val cms = udaf(Aggregators.CountMinSketch(depth, width))
    val sk = rows.agg(cms(col("idx"))).collect().head.getSeq[Long](0)
    val est = (0 until depth).map { r =>
      element_at(typedLit(sk), col("idx").getItem(r) + lit(r * width + 1))
    }.reduce(least(_, _))
    val under = rows.groupBy("k", "idx").agg(count(lit(1)).as("truth"))
      .filter(est < col("truth")).count()
    assert(under === 0)
  }

  test("sketch heavy hitters ≡ exact heavy hitters (prefilter changes plan, not result)") {
    val exact = Analytics.qHeavyHitters(spark, sfDir).collect().map(_.toSeq)
    val sketched = Analytics.qHeavyHittersSketch(spark, sfDir).collect().map(_.toSeq)
    assert(sketched.toSeq === exact.toSeq)
    assert(exact.nonEmpty)
  }

  test("bloom gate ≡ exact hash membership, and flags every re-ingested doc") {
    import graft.functions.TextFunctions.normText
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(normText(col("text"))).as("h"))
    val base = docs.filter(col("doc_id") < 400)
    // same re-crawl derivation as the operator: new docs + re-keyed base slice
    val delta = docs.filter(col("doc_id") >= 400)
      .unionByName(base.filter(col("doc_id") % 50 === 0)
        .select((-col("doc_id") - 1).as("doc_id"), col("h")))
    val expected = delta.as("d")
      .join(base.as("b"), col("d.h") === col("b.h"), "left")
      .groupBy(col("d.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("match_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = Dedup.bloomGate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(got === expected)
    // every re-ingested doc must be flagged dup with its original as match
    val reingested = base.filter(col("doc_id") % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(reingested.nonEmpty)
    reingested.foreach { id =>
      assert(got(-id - 1).isDefined, s"re-ingested $id not flagged")
    }
    assert(got.values.exists(_.isEmpty), "some delta docs must be new")
  }

  test("DSIR scores separate target-like from off-target documents") {
    val scored = TextQueries.textDsir(spark, sfDir)
      .join(Tables.load(spark, sfDir, "documents").select("doc_id", "lang"), "doc_id")
    val means = scored
      .groupBy(col("lang") === "en")
      .agg(avg(col("mean_logratio_micro")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // English docs (the target) must score strictly higher on average
    assert(means(true) > means(false),
      s"target mean ${means(true)} not above off-target ${means(false)}")
  }

  test("whitened projection has identity covariance") {
    // recompute the full whitened vectors (not the rounded output
    // columns) and check unit variance / zero cross-correlation
    import operators.Similarity
    val rows = Similarity.embWhiten(spark, sfDir, k = 4).collect()
    assert(rows.nonEmpty)
    // w1 column is the first whitened coordinate: population variance ≈ 1
    val w1 = rows.map(_.getDouble(2))
    val m = w1.sum / w1.length
    val v = w1.map(x => (x - m) * (x - m)).sum / w1.length
    RecallLog.record("emb_whiten", "unit_variance_abs_error", math.abs(v - 1.0))
    assert(math.abs(v - 1.0) < 0.05, s"w1 variance $v not ~1")
    assert(math.abs(m) < 0.05, s"w1 mean $m not ~0")
  }

  test("BPE learns the hand-computed merges on a fixed corpus") {
    import spark.implicits._
    // corpus: "low low low lower lower newest newest newest newest"
    // word freqs: low=3, lower=2, newest=4 (single chars after split)
    // pair counts r1: (e,s)=4+? ... computed by hand below.
    val tmp = java.nio.file.Files.createTempDirectory("bpe_spec").toString
    Seq((1L, "low low low lower lower newest newest newest newest", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val merges = TextQueries.textBpe(spark, tmp, nMerges = 3, minFreq = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand computation, freqs low=3 lower=2 newest=4 ("we" counts in
    // BOTH lower and newest):
    //   round 1: lo=5, ow=5, we=2+4=6, er=2, ne=4, ew=4, es=4, st=4
    //     → (w,e)=6 wins
    //   round 2 (lower→[l,o,we,r], newest→[n,e,we,s,t]):
    //     lo=5, ow=3, o·we=2, we·r=2, ne=4, e·we=4, we·s=4, st=4
    //     → (l,o)=5 wins
    //   round 3 (low→[lo,w], lower→[lo,we,r]):
    //     lo·w=3, lo·we=2, we·r=2, ne=4, e·we=4, we·s=4, st=4
    //     → tie at 4: (e,we) < (n,e) < (s,t) < (we,s) lexicographically
    assert(merges(0) === ((1, "w", "e", 6L)))
    assert(merges(1) === ((2, "l", "o", 5L)))
    assert(merges(2) === ((3, "e", "we", 4L)))
  }

  test("sketch heavy hitters plan: CMS is an aggregate, probe is map-side") {
    val plan = Analytics.qHeavyHittersSketch(spark, sfDir)
      .queryExecution.executedPlan.toString
    // sketch built as a mergeable aggregate (partial state map-side)...
    assert(plan.contains("ObjectHashAggregate"))
    // ...and broadcast back, never shuffled row-wise
    assert(plan.contains("BroadcastNestedLoopJoin"))
    // the prefilter folds into the broadcast join's condition, so it
    // runs before the exact aggregate's exchange
    assert(plan.contains("element_at"))
  }

  test("DSIR plan: score table broadcasts; corpus shuffles once by doc_id") {
    val plan = TextQueries.textDsir(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the 256-row bucket-score table joins back as a broadcast
    assert(plan.contains("BroadcastHashJoin"))
    // exactly one exchange keyed on doc_id (the final per-doc reduce);
    // bucket-model exchanges are bounded-size aggregates
    val docExchanges = "hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(docExchanges === 1, s"expected 1 doc_id exchange, plan:\n$plan")
  }

  test("Jacobi eigensolve: orthonormal vectors, A·v = λ·v, descending values") {
    // fixed symmetric matrix with known structure
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (values, vectors) = graft.functions.LinAlg.symEig(a)
    val n = 4
    assert(values.sliding(2).forall { case Array(x, y) => x >= y })
    // trace preserved
    assert(math.abs(values.sum - (a(0)(0) + a(1)(1) + a(2)(2) + a(3)(3))) < 1e-9)
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(t => vectors(i)(t) * vectors(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"v${i}.v${j} = $dot")
    }
    for (i <- 0 until n) {
      val av = (0 until n).map(r => (0 until n).map(c => a(r)(c) * vectors(i)(c)).sum)
      av.zip(vectors(i)).foreach { case (x, v) =>
        assert(math.abs(x - values(i) * v) < 1e-8, s"A·v$i mismatch")
      }
    }
  }

  test("PCA: variance ordering, captured fraction, projection parity") {
    import graft.functions.Aggregators
    val out = operators.Similarity.embPca(spark, sfDir, k = 4).collect()
    assert(out.nonEmpty)
    // var_fraction is a sane fraction and pc1 captures the most variance
    val vf = out.head.getDouble(2)
    RecallLog.record("emb_pca", "captured_var_fraction_k4", vf)
    assert(vf > 0.0 && vf <= 1.0 + 1e-9)
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val pc1 = out.map(_.getDouble(3))
    val pc2 = out.map(_.getDouble(4))
    assert(variance(pc1) >= variance(pc2) - 1e-6,
      s"pc1 var ${variance(pc1)} < pc2 var ${variance(pc2)}")
    // projections are centered: each component's mean ≈ 0
    assert(math.abs(pc1.sum / pc1.length) < 1e-2)
    assert(math.abs(pc2.sum / pc2.length) < 1e-2)
    // parity: the gram-aggregate covariance diagonal matches a direct
    // two-pass computation on the collected vectors
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val gram = vecs.foldLeft(Aggregators.GramMatrix.zero)((b, v) =>
      Aggregators.GramMatrix.reduce(b, v.map(_.toFloat).toSeq))
    val (sums, tri, n) = (gram._1, gram._2, gram._3.toDouble)
    for (i <- 0 until d) {
      val triIdx = i * d - i * (i - 1) / 2 // offset of (i,i) in the packed triangle
      val aggVar = tri(triIdx) / n - math.pow(sums(i) / n, 2)
      val direct = variance(vecs.map(_(i)))
      assert(math.abs(aggVar - direct) < 1e-6, s"dim $i: $aggVar vs $direct")
    }
  }

  test("bigram surprisal: memorized transitions score below novel ones") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bigram_spec").toString
    Seq((1L, "a b a b a b a b a b", "en", "s", 19L),   // one repeated transition
        (2L, "q w e r t y u i o p", "en", "s", 19L))   // all transitions unique
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextQueries.textBigramSurprisal(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L),
      s"repetitive doc ${out(1L)} not below novel doc ${out(2L)}")
  }

  test("BPE apply: per-doc piece counts match the learned segmentation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_apply").toString
    Seq((1L, "low low lower newest", "en", "s", 9L),
        (2L, "low a newest newest", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // freqs: low=3, lower=1, newest=3. 3 merges by hand:
    //   r1: lo=4, ow=4, we=4, er=1, ne=3, ew=3, es=3, st=3
    //       → tie at 4: (l,o) < (o,w) < (w,e) → (l,o)
    //   r2 (low→[lo,w], lower→[lo,w,e,r]): lo·w=4, we=4, er=1, ne/ew/es/st=3
    //       → tie at 4: (lo,w) < (w,e) → (lo,w)
    //   r3 (low→[low], lower→[low,e,r]): low·e=1, er=1, ne/ew/es/st=3, we=3
    //       → tie at 3: (e,s) < (e,w) < (n,e) < (s,t) < (w,e) → (e,s)
    // segmentations after 3 merges:
    //   low    → [low]              = 1 piece
    //   lower  → [low, e, r]        = 3 pieces
    //   newest → [n, e, w, es, t]   = 5 pieces
    //   a      → untrained single letter = 1 piece
    val out = TextQueries.textBpeApply(spark, tmp, nMerges = 3, minFreq = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((4L, 1 + 1 + 3 + 5)))  // low low lower newest
    assert(out(2L) === ((4L, 1 + 1 + 5 + 5)))  // low a newest newest
    RecallLog.record("text_bpe_apply", "exact_match_fixed_corpus", 1.0)
  }

  test("BPE splice is greedy left-to-right (non-overlapping)") {
    import spark.implicits._
    // "aaaa" with merge (a,a) must become [aa, aa], not [aa, a, a] or overlap
    val tmp = java.nio.file.Files.createTempDirectory("bpe_spec2").toString
    Seq((1L, "aaaa aaaa aaa", "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val merges = TextQueries.textBpe(spark, tmp, nMerges = 2, minFreq = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // freqs: aaaa=2, aaa=1. round 1: (a,a) = 2*3 + 1*2 = 8
    // round 2: aaaa → [aa,aa] gives (aa,aa)=2; aaa → [aa,a] gives (aa,a)=1
    //   → argmax (aa,a)... tie? (aa,aa)=2 vs (aa,a)=1 → (aa,aa) wins
    assert(merges(0) === ((1, "a", "a", 8L)))
    assert(merges(1) === ((2, "aa", "aa", 2L)))
    RecallLog.record("text_bpe", "exact_match_fixed_corpus", 1.0)
  }
}
