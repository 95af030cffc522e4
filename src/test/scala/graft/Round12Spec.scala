package graft

import graft.queries.IOQueries
import graft.streaming.Events
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Round-6 late specs: targeted erasure (K14) and streaming CDC (E23).
  *
  * sink_delete's oracle checks the surviving aggregate; what it cannot
  * see is the SCALE property — that untouched files were carried into
  * the next manifest version by reference instead of being rewritten.
  * These specs open the manifest store and pin exactly that, plus the
  * stream/batch convergence of the CDC feed.
  */
class Round12Spec extends SparkSpec {

  test("sink_delete: untouched files carry by reference; doomed rows are gone") {
    val base = Files.createTempDirectory("graft_erase_spec").toString
    val (lo, hi) = (100L, 120L)
    val out = IOQueries.sinkDelete(spark, sfDir, lo, hi, Some(base)).collect()

    val versions = graft.sinks.ManifestStore.versions(spark, base + "/manifest")
    assert(versions == Seq(1L, 2L), s"expected exactly v1+v2, got $versions")
    def fileSet(v: Long) = spark.read.json(s"$base/manifest/manifest_v$v")
      .select("file").collect().map(_.getString(0)).toSet
    val (v1, v2) = (fileSet(1), fileSet(2))

    // the scale property: erasure rewrote SOME files, not the table —
    // carried files appear in both versions under the SAME path
    val carried = v1 intersect v2
    val rewritten = v2 diff v1
    assert(carried.nonEmpty, "no file was carried by reference")
    assert(rewritten.nonEmpty, "no file was rewritten — the doomed range hit nothing")
    assert((v1 diff v2).nonEmpty, "no original file was retired")

    // the erased table: zero doomed rows, exact survivor count
    val cur = spark.read.parquet(v2.toSeq: _*)
    assert(cur.filter(col("o_custkey") >= lo && col("o_custkey") <= hi).count() == 0L)
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_custkey") < lo || col("o_custkey") > hi).count()
    assert(cur.count() == expected)
    assert(out.head.getLong(0) == expected && out.head.getBoolean(2))
  }

  test("sink_delete: a miss (range outside the table) rewrites nothing") {
    val base = Files.createTempDirectory("graft_erase_miss").toString
    val out = IOQueries.sinkDelete(spark, sfDir, 1000000L, 1000010L, Some(base)).collect()
    def fileSet(v: Long) = spark.read.json(s"$base/manifest/manifest_v$v")
      .select("file").collect().map(_.getString(0)).toSet
    assert(fileSet(1) == fileSet(2), "a no-op erase must carry every file unchanged")
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(out.head.getLong(0) == total)
    assert(!out.head.getBoolean(2)) // pruned=false: nothing was doomed
  }

  test("t_target_encode: encode stats join is a broadcast, no second fact shuffle") {
    val df = queries.Analytics.tTargetEncode(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"category stats should broadcast onto the fact scan:\n$plan")
    // LOO identity: category avg of (sum-x)/(n-1) == the plain category
    // mean — a closed-form invariant of the encode
    val enc = df.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val plain = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(round(avg("o_totalprice"), 2).as("m"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    enc.foreach { case (k, v) =>
      assert(math.abs(v - plain(k)) < 0.05,
        s"LOO avg for $k drifted from the category mean: $v vs ${plain(k)}")
    }
  }

  test("q_ab_test: welch statistic matches a driver-side replay") {
    val out = queries.Analytics.qAbTest(spark, sfDir).collect().head
    val rows = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("v"), col("value"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    def stats(v: Int) = {
      val xs = rows.filter(_._1 == v).map(_._2)
      val m = xs.sum / xs.length
      val va = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      (xs.length.toLong, m, va)
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(out.getLong(0) == na && out.getLong(1) == nb)
    assert(math.abs(out.getDouble(3) - t) < 1e-3,
      s"t_stat ${out.getDouble(3)} vs replay $t")
    assert(out.getBoolean(4) == (math.abs(t) > 1.96))
  }

  test("sink_bloom_index: bloom manifest prunes most files, zero false negatives") {
    val (df, nHit, nFiles) = IOQueries.bloomIndexLookup(spark, sfDir)
    // 2 probe keys against 16 hash-clustered files: each key lives in
    // exactly one file, fpp adds at most a file or two — reading more
    // than 1/4 of the lake means the bloom isn't pruning
    assert(nFiles == 16, s"expected 16 lake files, got $nFiles")
    assert(nHit <= 4, s"bloom pruning too weak: read $nHit of $nFiles files")
    // no false negatives: the pruned read returns exactly the probe rows
    val out = df.collect()
    val orders = Tables.load(spark, sfDir, "orders")
    val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).collect().head
    val expect = orders
      .filter(col("o_orderkey").isin(mm.getLong(0), mm.getLong(1)))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toMap == expect)
    assert(out.forall(_.getBoolean(3)), "pruned flag must be true")
  }

  test("q_moments: skewness/kurtosis match a driver-side replay") {
    val out = queries.Analytics.qMoments(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
    Seq(("l_quantity", 0), ("l_extendedprice", 1), ("l_discount", 2))
      .foreach { case (name, i) =>
        val c = rows.map(r => math.round(r.getDouble(i) * 100).toDouble)
        val n = c.length.toDouble
        val m = c.sum / n
        val m2 = c.map(x => (x - m) * (x - m)).sum / n
        val m3 = c.map(x => math.pow(x - m, 3)).sum / n
        val m4 = c.map(x => math.pow(x - m, 4)).sum / n
        val r = out(name)
        assert(math.abs(r.getDouble(2) - m / 100.0) < 1e-2, s"$name mean")
        assert(math.abs(r.getDouble(3) - math.sqrt(m2) / 100.0) < 1e-2, s"$name std")
        assert(math.abs(r.getDouble(4) - m3 / (math.sqrt(m2) * m2)) < 1e-3,
          s"$name skew: ${r.getDouble(4)} vs ${m3 / (math.sqrt(m2) * m2)}")
        assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3.0)) < 1e-3,
          s"$name kurt: ${r.getDouble(5)} vs ${m4 / (m2 * m2) - 3.0}")
      }
  }

  test("t_incr_join: the stored view is read back, not recomputed") {
    val df = IOQueries.tIncrJoin(spark, sfDir)
    // the refresh plan must contain the materialized view's parquet
    // scan — if the base join were recomputed, the orders/customer
    // sources would appear four times instead of three delta terms
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).size
    assert(scans >= 1, "no parquet read-back of the stored view in the plan")
    val incr = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
    val scratch = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_nationkey")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
    assert(incr.sameElements(scratch), "incremental refresh diverged from scratch join")
  }

  test("dq_fk: orphan counts equal the injected corruption exactly") {
    val rows = IOQueries.dqFk(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    val li = Tables.load(spark, sfDir, "lineitem")
    val injected = li.filter(col("l_orderkey") % 1000 === 1).count()
    // every injected negated key is an orphan, and nothing else is
    assert(rows("lineitem.l_orderkey->orders").getLong(2) == injected)
    assert(rows("lineitem.l_partkey->part").getLong(2) == injected)
    assert(rows("lineitem.l_suppkey->supplier").getLong(2) == injected)
    val oInj = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 1000 === 1).count()
    assert(rows("orders.o_custkey->customer").getLong(2) == oInj)
    assert(injected > 0 && oInj > 0, "injection must be non-vacuous")
    // intact base data: child rows == orphans + parented rows
    rows.values.foreach { r =>
      assert(r.getLong(1) > r.getLong(2), s"${r.getString(0)}: all rows orphaned")
      assert(r.getLong(4) <= r.getLong(3), s"${r.getString(0)}: coverage > parent count")
    }
  }

  test("t_group_split: a source can never straddle two splits") {
    import queries.TextQueries
    val out = TextQueries.tGroupSplit(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"),
      "all three splits must be non-vacuous")
    // leakage impossibility: re-derive the split per source and check
    // each source maps to exactly one
    val perSource = Tables.load(spark, sfDir, "documents")
      .withColumn("b", substring(md5(concat(lit("split2:"), col("source"))), 1, 2))
      .withColumn("split", when(col("b") < "cc", "train")
        .when(col("b") < "e6", "val").otherwise("test"))
      .groupBy("source").agg(countDistinct("split").as("k"))
      .collect()
    assert(perSource.forall(_.getLong(1) == 1L), "a source landed in two splits")
    // split totals conserve the corpus
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(out.map(_.getLong(1)).sum == total)
  }

  test("e_attribution matches a driver-side replay of the user timelines") {
    val out = queries.Analytics.eAttribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val events = Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "value", "ts_ns")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val sevenDays = 7L * 24 * 3600 * 1000000000L
    val replay = events.groupBy(_._1).values.flatMap { tl =>
      val sorted = tl.sortBy(e => (e._5, e._2))
      sorted.zipWithIndex.collect { case ((_, _, "purchase", v, ts), i) =>
        val touch = sorted.take(i).filter(e => e._3 == "click" || e._3 == "view")
          .lastOption
        val ch = touch match {
          case Some(t) if ts - t._5 <= sevenDays => t._3
          case _ => "none"
        }
        (ch, v)
      }
    }.toSeq
    val expected = replay.groupBy(_._1).map { case (ch, xs) =>
      ch -> (xs.size.toLong, math.round(xs.map(_._2).sum * 100) / 100.0)
    }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (ch, (n, rev)) =>
      assert(out(ch)._1 == n, s"$ch purchase count")
      assert(math.abs(out(ch)._2 - rev) < 0.05, s"$ch revenue: ${out(ch)._2} vs $rev")
    }
  }

  test("q_dpp: the fact scan carries a runtime dynamicpruning partition filter") {
    val df = IOQueries.qDpp(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in the fact scan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0).startsWith("1996-0")))
  }

  test("e_stream_outer_join: every purchase emits — the watermark flushed the tail") {
    val out = Events.streamStreamOuterJoin(spark, sfDir).collect()
    val nPurchases = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    // outer property: unmatched purchases null-emit instead of being
    // held in state at termination (this is what the pusher batches buy)
    assert(out.length >= nPurchases,
      s"${out.length} rows < $nPurchases purchases: the unmatched tail never flushed")
    assert(out.map(_.getLong(1)).distinct.length == nPurchases,
      "some purchase event_id is missing entirely")
    assert(out.exists(_.isNullAt(3)), "no null-extended row — outer semantics lost")
    assert(out.exists(!_.isNullAt(3)), "no matched row — interval join vacuous")
  }

  test("t_quantile_bin: bins are equal-frequency and partition the table") {
    val out = queries.Analytics.tQuantileBin(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(out.map(_.getLong(1)).sum == total, "bins must partition the table")
    assert(out.length == 10, s"expected 10 bins, got ${out.length}")
    val target = total / 10.0
    out.foreach { r =>
      assert(math.abs(r.getLong(1) - target) <= math.max(2, target * 0.02),
        s"bin ${r.getInt(0)} holds ${r.getLong(1)} rows, target ~$target")
    }
    // right-closed ordering: consecutive bins can't overlap
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"bin ${a.getInt(0)} max >= bin ${b.getInt(0)} min")
      case _ =>
    }
  }

  test("q_aqe_skew: AQE splits the hot partition and the answer is unchanged") {
    val out = queries.Analytics.qAqeSkew(spark, sfDir).collect()
    assert(out.forall(_.getBoolean(4)), "OptimizeSkewedJoin did not fire")
    // ~90% of fact rows carry key 0 — the hot key must dominate
    val n = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(0L) > n.values.sum * 8 / 10, s"hot key not hot: $n")
    // the split changed the schedule, not the answer
    val li = Tables.load(spark, sfDir, "lineitem").count()
    assert(n.values.sum == li, "inner join must preserve every fact row")
  }

  test("e_stream_resume: the second query instance consumes only the new files") {
    val base = Files.createTempDirectory("graft_resume_spec").toString
    val out = Events.streamResume(spark, sfDir, Some(base)).collect()
    // the checkpoint's offsets log must show exactly two committed
    // batches — one per query instance, no reprocessing
    val offsets = new java.io.File(base + "/cp/offsets").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(offsets.sameElements(Array("0", "1")),
      s"expected offset batches 0,1 — got ${offsets.mkString(",")}")
    val commits = new java.io.File(base + "/cp/commits").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(commits.sameElements(Array("0", "1")), "both batches must be committed")
    // end-to-end conservation: n == n_distinct per type (no duplicates)
    out.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"${r.getString(0)}: ${r.getLong(1)} rows vs ${r.getLong(2)} distinct ids"))
    val total = Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getLong(1)).sum == total)
  }

  test("p_dirty_partitions: exactly the changed month is recomputed") {
    val base = Files.createTempDirectory("graft_dirty_spec").toString
    val out = IOQueries.pDirtyPartitions(spark, sfDir, Some(base)).collect()
    val (_, v2) = graft.sinks.ManifestStore.current(spark, base + "/manifest")
    val byVersion = v2.groupBy("version_built").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byVersion(2L) == 1L,
      s"exactly one partition should rebuild, got ${byVersion.getOrElse(2L, 0L)}")
    assert(byVersion(1L) == out.length - 1L, "every clean month must carry forward")
    val rebuilt = v2.filter(col("version_built") === 2L)
      .select("month").collect().map(_.getString(0))
    assert(rebuilt.sameElements(Array("1996-03")), "the dirty month is 1996-03")
  }

  test("ann_mips: inner-product ranking is exact and differs from cosine") {
    import operators.Similarity
    val mips = Similarity.mipsTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cos = Similarity.bruteForceTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(mips.keySet == cos.keySet, "same (query, rank) grid")
    // the canonical corpus is unit-norm (MIPS ≡ cosine there, checked
    // below via the replay); plant magnitude to see the difference:
    // scaling vectors by (1 + id mod 3) must change the MIPS ranking
    val scaled = Tables.load(spark, sfDir, "embeddings")
      .withColumn("embedding", transform(col("embedding"),
        x => (x * (lit(1.0) + col("vec_id") % 3)).cast("float")))
    val mipsScaled = Similarity.mipsTopKOf(scaled, 5, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(mipsScaled != mips,
      "norm-scaled MIPS ranking unchanged — magnitude is being ignored")
    // exactness: replay query 0's scores driver-side
    val vecs = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q0 = vecs(0L)
    def dot(a: Array[Float], b: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expect = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (math.round(dot(q0, v) * 10000) / 10000.0, id) }
      .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2)
    val got = (1 to 5).map(r => mips((0L, r)))
    assert(got == expect, s"query-0 top-5: $got vs replay $expect")
  }

  test("sink_wap: a failing audit leaves no reader-visible trace") {
    val base = Files.createTempDirectory("graft_wap_spec").toString
    val out = IOQueries.sinkWap(spark, sfDir, Some(base)).collect()
      .map(r => r.getString(0) -> r).toMap
    // the rejected candidate must not have consumed a version number —
    // exactly v1 and v2 exist, nothing in between, nothing extra
    val versions = graft.sinks.ManifestStore.versions(spark, base + "/manifest")
    assert(versions == Seq(1L, 2L), s"expected v1+v2 only, got $versions")
    assert(!out("2_reject_corrupt").getBoolean(3), "corrupt batch published")
    assert(out("2_reject_corrupt").getLong(4) == 1L,
      "visible version moved on a failed audit")
    assert(out("2_reject_corrupt").getLong(2) > 0, "audit found nothing — vacuous")
    // the live table is the fixed batch, row-exact
    val (_, cur) = graft.sinks.ManifestStore.current(spark, base + "/manifest")
    val live = spark.read.parquet(cur.select("path").collect().head.getString(0))
    assert(live.filter(col("o_totalprice") <= 0).count() == 0L)
    assert(live.count() == out("3_publish_fixed").getLong(1))
  }

  test("q_interval_join: the overlap join is banded — no nested-loop plan") {
    val df = queries.Analytics.qIntervalJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested-loop/cartesian plan:\n$plan")
    // non-vacuous at sf0.001: some overnight window overlaps activity
    assert(df.collect().nonEmpty, "no overlapping window found")
  }

  test("ts_ols: a perfect line is forecast with zero error and exact slope") {
    import spark.implicits._
    val series = (1 to 40)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        1000000L + 250L * i))
      .toDF("d", "y")
    val out = queries.TimeSeries.olsOf(series).collect()
    assert(out.length == 40 - 8 + 1 || out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == 250L, s"slope ${r.getLong(2)} != 250 on a perfect line")
      assert(r.getLong(4) == 0L, s"nonzero forecast error ${r.getLong(4)} on a line")
    }
    // and on real data it runs with warmup rows excluded (forecasts
    // may legitimately go negative on declining windows — only the
    // backtest error being defined everywhere is contractual)
    val real = queries.TimeSeries.ols(spark, sfDir).collect()
    assert(real.nonEmpty && real.forall(_.getLong(4) >= 0))
  }

  test("g_ppr: teleport mass never reaches a disconnected component") {
    import spark.implicits._
    // two disjoint 3-cycles; seeds only in the first
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("snode")
    val out = operators.Graph.pprOf(pairs, seeds, iters = 5, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (comp1, comp2) = (Set(1L, 2L, 3L), Set(10L, 11L, 12L))
    assert(comp1.forall(n => out.getOrElse(n, 0L) > 0L),
      s"seed component lost mass: $out")
    assert(comp2.forall(n => out.getOrElse(n, 0L) == 0L),
      s"mass leaked into the disconnected component: $out")
    // the seed itself must outrank its non-seed neighbors
    assert(out(1L) > out(2L) && out(1L) > out(3L), s"seed not dominant: $out")
  }

  test("dedup_delete_vectors: files never rewrite; the vector is position-exact") {
    import operators.Dedup
    val base = Files.createTempDirectory("graft_dv_spec").toString
    val before = () => new java.io.File(base + "/lake").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val out = Dedup.deleteVectors(spark, sfDir, Some(base)).collect().head
    val files = before()
    // the deduped view came from metadata, not a rewrite: the lake's
    // payload files are exactly the ones the initial write produced
    assert(files.nonEmpty)
    val (_, vec) = graft.sinks.ManifestStore.current(spark, base + "/dv")
    val dv = vec.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dv.length == out.getLong(3), "vector size != reported n_deleted")
    assert(dv.nonEmpty, "no duplicates planted — vacuous")
    assert(dv.forall { case (f, _) => files.contains(f) },
      "vector addresses a file outside the lake")
    // conservation: survivors + deleted == planted corpus
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(out.getLong(0) + out.getLong(3) == total)
    // keepers survive: distinct content count equals survivor count
    assert(out.getLong(0) == out.getLong(1), "a duplicate survived the vector")
  }

  test("e_stream_cdc converges to the batch CDC merge's final state") {
    val streamed = Events.streamCdc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = IOQueries.sinkMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream/batch CDC divergence:\nstream=$streamed\nbatch=$batch")
  }
}
