package graft

/** GOLDEN plan-shape suite (VERDICT r8 "Next round" #7): the
  * load-bearing physical-plan properties of the most expensive
  * registry entries, consolidated in ONE place so a plan regression
  * fails CI as a named assertion instead of surfacing rounds later as
  * bench drift. Entries are the driver-median top-cost set (graph
  * family, candidate-generation dedup/ANN, fact-join transforms).
  *
  * Only SIZE-INDEPENDENT properties are pinned:
  *   - no `CartesianProduct` / `BroadcastNestedLoopJoin` — every
  *     candidate generator must stay equi-join/aggregate shaped at
  *     any scale (a quadratic plan at sf0.001 is a quadratic plan at
  *     100 TB);
  *   - `TakeOrderedAndProject` where a global top-K is the operator's
  *     final step — k rows per partition cross the wire, never a
  *     global sort;
  *   - `PushedFilters`/`ReadSchema` on the canonical scan entry —
  *     pushdown reaching the parquet reader.
  * Join STRATEGY (broadcast vs sort-merge) is deliberately not pinned:
  * it is size-dependent and AQE's to choose.
  *
  * AQE caveat: plans are read pre-execution (the "Initial Plan"
  * section when AQE wraps), which is where a structural quadratic
  * would appear — AQE can demote join strategies but never introduces
  * a cartesian that the logical plan didn't imply.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private val noNestedLoop = Seq(
    // graph family — every round must stay one equi-join + one
    // map-side-combinable aggregate over checkpointed edges
    "g_clustering", "g_kcore", "g_components", "g_pagerank", "g_ppr",
    "g_sssp", "g_adamic_adar", "g_jaccard", "g_communities", "g_closeness",
    // dedup candidate generation — inverted-index / banding / block
    // equi-joins only; the quadratic form lives in the ORACLE, not here
    "dedup_containment", "dedup_ngram_jaccard", "dedup_substring",
    "dedup_substring_remove", "dedup_snm", "dedup_cdc", "dedup_clusters",
    // ANN — bucket/probe equi-joins + mergeable top-k aggregates
    "ann_ivfpq", "ann_knn_lsh",
    // text heavy hitters — vocab-bounded joins
    "text_rake",
    // fact-join transforms — PIT is an equi-join with the validity
    // range as a post-filter, negative sampling an equi anti-join
    "q_pit_join", "t_neg_sample",
    "emb_kmeans")

  noNestedLoop.foreach { name =>
    test(s"$name: no CartesianProduct / BroadcastNestedLoopJoin") {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"cartesian in $name:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in $name:\n$plan")
    }
  }

  /** Ops that deliberately CROSS a broadcast scalar/bounded frame into
    * every row (global counts, corpus stats, the |sources| list, the
    * vocab): the cross side is constant or vocab-bounded, so the BNLJ
    * is benign at any scale — but it must stay a `Cross` of a
    * broadcast side. A BNLJ with a JOIN CONDITION (Inner/LeftOuter…)
    * would mean a non-equi join slipped into a data-scale path, which
    * is exactly the regression this suite exists to catch.
    */
  private val boundedCross = Seq(
    "g_triangles",   // final 1-row × 1-row × 1-row scalar cross
    "ann_ivf_sweep", // ground-truth arm: corpus × broadcast(queries)
    "text_transfer", // tf × broadcast(|sources|) × broadcast(vocab)
    "text_bm25")     // docs × broadcast(corpus avgdl/N stats)

  boundedCross.foreach { name =>
    test(s"$name: no CartesianProduct; nested-loop only as a broadcast Cross of a bounded side") {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"cartesian in $name:\n$plan")
      val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
      // allowed: an unconditioned Cross of a broadcast bounded frame,
      // and (ann_ivf_sweep only) the exact-ground-truth brute-force —
      // corpus × broadcast(bounded query set) where the self-pair
      // exclusion rides as the BNLJ condition; its cost is the sweep's
      // own documented |corpus|·|queries| contract, not an accident
      assert(bnlj.forall(l => l.contains(", Cross") ||
          (name == "ann_ivf_sweep" && l.contains("NOT (vec_id"))),
        s"$name: conditioned BNLJ (non-equi join on a data-scale path) in:\n${bnlj.mkString("\n")}")
    }
  }

  Seq("g_adamic_adar", "q_streaks", "q_topk", "text_pmi", "g_closeness").foreach { name =>
    test(s"$name: global top-K distributes as TakeOrderedAndProject") {
      val plan = planOf(name)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name: k rows per partition must cross the wire, not a global sort:\n$plan")
    }
  }

  test("src_parquet: filter and projection reach the parquet scan") {
    val plan = planOf("src_parquet")
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), Not(EqualTo(l_returnflag,N))]"),
      s"filter must push into the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_extendedprice:double,l_returnflag:string>"),
      s"scan must read only the two projected columns:\n$plan")
  }
}
