package graft

import graft.queries.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specs for the KeepFirstRewrite optimizer rule (the
  * injectOptimizerRule extension rung): a `row_number() ≤ 1` keep-first
  * window must compile to a struct-min aggregation — no Window, no rank
  * evaluation, partial aggregation bounding the shuffle — without
  * changing results; patterns outside the rule's conservative guards
  * must be left alone. (min(struct) plans as SortAggregate — struct
  * buffers aren't hash-aggregable — but it sorts by the KEY only,
  * where the window form sorts by key ++ order columns on both sides
  * of its exchange and then ranks.)
  */
class Round7Spec extends SparkSpec {

  test("keep-first window compiles to an aggregate (no Window in the plan)") {
    val plan = Relational.tDedupKeyRule(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    assert(plan.contains("partial_min(named_struct"),
      s"expected a partial struct-min aggregate:\n$plan")
  }

  test("rewritten keep-first equals the hand-written struct-min dedup") {
    val viaRule = Relational.tDedupKeyRule(spark, sfDir).collect().map(_.toSeq)
    val direct = Relational.tDedupKey(spark, sfDir).collect().map(_.toSeq)
    assert(viaRule.toSeq === direct.toSeq)
    assert(viaRule.nonEmpty)
  }

  test("descending keep-first is NOT rewritten (outside the guard)") {
    // struct-min cannot express DESC without per-type inversion — the
    // rule must leave this plan to the window machinery
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_quantity").desc)
    val plan = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number") || plan.contains("Window"),
      s"descending pattern was wrongly rewritten:\n$plan")
  }

  test("rank cutoffs beyond 1 are NOT rewritten") {
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_quantity")
    val plan = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number") || plan.contains("Window"),
      s"rank-2 pattern was wrongly rewritten:\n$plan")
  }

  test("global (no PARTITION BY) keep-first is NOT rewritten — empty input stays empty") {
    // a global Aggregate would emit one all-null row on empty input
    // where the window+filter emits zero rows
    val w = Window.orderBy("l_orderkey")
    val df = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") < -1) // empty
      .select("l_orderkey", "l_quantity")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(df.count() === 0)
  }

  test("k-anonymity: every published group >= k, and the rung is minimal") {
    val k = 5
    val rows = queries.Analytics.tKanon(spark, sfDir, k).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= k), "a group below k was published")
    val lvl = rows.head.getInt(3)
    assert(rows.forall(_.getInt(3) === lvl))
    // minimality: the next-finer rung must violate k (else it would
    // have been chosen); recompute its min group size directly
    if (lvl > 0) {
      val c = Tables.load(spark, sfDir, "customer")
        .join(Tables.load(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
      val finer = lvl match {
        case 1 => c.groupBy(col("n_name"), floor(col("c_acctbal") / 100))
        case 2 => c.groupBy(col("n_name"), floor(col("c_acctbal") / 1000))
        case _ => c.groupBy(col("n_name"))
      }
      val minFiner = finer.agg(count(lit(1)).as("n"))
        .agg(min("n")).collect().head.getLong(0)
      assert(minFiner < k, s"finer rung min $minFiner >= $k — rung not minimal")
    }
  }

  test("lateral top-2 decorrelates to a bounded rank window, not a per-row loop") {
    val plan = Relational.qLateral(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected decorrelated window plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"lateral fell back to a cartesian per-row plan:\n$plan")
  }

  test("recursive BFS actually expands: hop-1 frontier is non-empty") {
    val hops = Relational.qRecursive(spark, sfDir).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(hops.getOrElse(0, 0) > 0, "no seeds")
    assert(hops.getOrElse(1, 0) > 0, s"recursion never expanded: $hops")
  }

  test("HLL rolling actives within 5% of the exact rolling distinct") {
    val exact = queries.Analytics.qRollingDistinct(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = queries.Analytics.qRollingDistinctHll(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    // per-day 8% (~5 sigma of the lgK=12 RSE — the per-day tail over
    // ~100 window days must not flake) plus a tight 3% median bound
    val relErrs = exact.toSeq.map { case (d, n) =>
      val e = math.abs(approx(d) - n).toDouble / math.max(n, 1)
      assert(e < 0.08, s"day $d: approx ${approx(d)} vs exact $n")
      e
    }.sorted
    RecallLog.record("q_rolling_distinct_hll", "median_rel_error", relErrs(relErrs.size / 2))
    RecallLog.record("q_rolling_distinct_hll", "max_rel_error", relErrs.last)
    assert(relErrs(relErrs.size / 2) < 0.03,
      s"median relative error ${relErrs(relErrs.size / 2)} too high")
  }

  test("watermark accounting: stragglers dropped, conservation holds") {
    val out = graft.streaming.Events.streamLateData(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected values from event time directly; the cut must replay the
    // OPERATOR's own computation (interpolating percentile through a
    // double) — a nearest-index approximation can disagree by one event
    val ts = Tables.load(spark, sfDir, "events").select("ts_ns")
      .collect().map(_.getLong(0)).sorted
    val n = ts.length
    val p20 = Tables.load(spark, sfDir, "events")
      .selectExpr("percentile(ts_ns, 0.2)").collect().head.getDouble(0).toLong
    val stragglers = ts.count(_ < p20)
    assert(out("1_total_events") === n)
    assert(out("4_late_dropped_groups") > 0, "stragglers must actually be dropped")
    // every straggler was excluded from the emitted windows: emitted +
    // stragglers + events-in-open-windows == total
    val wmMicros = ts.max / 1000 - 3600L * 1000000L // final watermark (micros)
    val openEvents = ts.count { t =>
      val us = t / 1000
      // window end = next hour boundary after the event
      val windowEndUs = (us / 3600000000L + 1) * 3600000000L
      t >= p20 && windowEndUs > wmMicros
    }
    RecallLog.record("e_stream_late", "conservation_abs_error",
      math.abs(out("2_emitted_in_final_windows") + stragglers + openEvents - n).toDouble)
    assert(out("2_emitted_in_final_windows") + stragglers + openEvents === n,
      s"conservation failed: $out stragglers=$stragglers open=$openEvents")
  }

  test("stream-maintained rollup equals the from-scratch batch rollup") {
    val streamed = graft.streaming.Events.streamIncrRollup(spark, sfDir)
      .collect().map(_.toSeq)
    val direct = Tables.load(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 1e6).cast("long")) / 1e6, 2).as("total_value"))
      .orderBy("d").collect().map(_.toSeq)
    assert(streamed.toSeq === direct.toSeq)
    assert(streamed.length > 1)
  }

  test("rule fires through the session extensions (no runtime ensure needed)") {
    // the test session is built by GraftSession.withExtensions — the
    // production path; write the naive pattern with no ensure() call
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_quantity")
    val df = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    // and the kept rn column is the literal 1 for every row
    assert(df.select(min("rn"), max("rn")).collect().head.toSeq === Seq(1, 1))
  }
}
