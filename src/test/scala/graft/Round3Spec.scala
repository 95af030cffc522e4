package graft

import graft.operators.{Dedup, Similarity}
import graft.queries.{Analytics, IOQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Property specs for the round-2 batch-3 operators (Q29/Q30/T11, E17,
  * X12, D9, A7, K10, S7). The DuckDB oracle gate covers value-level
  * equality; these pin the semantic invariants that survive refactors.
  */
class Round3Spec extends SparkSpec {

  test("heavy hitters: exactly the parts above the frequency cut, with proof columns") {
    val total = Tables.load(spark, sfDir, "lineitem").count()
    val expected = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, n) => n * 1500 > total }.toMap
    val got = Analytics.qHeavyHitters(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == expected.keySet)
    got.foreach { r =>
      assert(r.getLong(2) == total)
      assert(r.getLong(1) == expected(r.getLong(0)))
    }
  }

  test("transitions: per-user adjacent pairs sum to events minus users") {
    val e = Tables.load(spark, sfDir, "events")
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    val sumN = Analytics.eTransitions(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    assert(sumN == nEvents - nUsers)
  }

  test("month-over-month: prev_total chains exactly to the prior row's total") {
    val rows = Analytics.qMoM(spark, sfDir).collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("prev_total") == a.getAs[Double]("total"))
      case _ =>
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev_total")))
  }

  test("profile: row counts uniform, key column unique and non-null") {
    val n = Tables.load(spark, sfDir, "orders").count()
    val prof = Analytics.tProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    val key = prof("o_orderkey")
    assert(key.getAs[Long]("n_nulls") == 0L)
    assert(key.getAs[Long]("n_distinct") == n)
  }

  test("topgrams: counts are document frequencies, sorted descending") {
    val rows = TextQueries.textTopgrams(spark, sfDir, k = 5).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).toSeq ==
      rows.map(_.getAs[Long]("n_docs")).sortBy(-_).toSeq)
    // replay every reported gram's document frequency by brute force
    val docBigrams = Tables.load(spark, sfDir, "documents")
      .select(lower(col("text")).as("t")).collect().map { r =>
        val toks = r.getString(0).replaceAll("[^a-z0-9]+", " ").trim.split(" ")
        toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }
    rows.foreach { r =>
      val gram = r.getString(0)
      assert(docBigrams.count(_.contains(gram)).toLong == r.getAs[Long]("n_docs"))
    }
  }

  test("semantic dedup: clusters partition the corpus; seeds own their clusters") {
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    val rows = Dedup.semanticDedup(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nVecs)
    assert(rows.map(_.getLong(0)).forall(c => c >= 0 && c < 8))
    // every seed scores 1.0 against itself, so each occupied seed
    // cluster keeps a member at sim 1.0
    rows.foreach(r => assert(r.getAs[Double]("keep_sim") == 1.0))
  }

  test("centroid: per-label means match a driver-side replay") {
    val replay = Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .groupBy(_._1).map { case (l, vs) =>
        val n = vs.length
        val dim = vs.head._2.length
        val means = (0 until dim).map { d =>
          math.round(vs.map(_._2(d).toDouble).sum / n * 1e6)
        }
        l -> ((n.toLong, means))
      }
    Similarity.embCentroid(spark, sfDir).collect().foreach { r =>
      val (n, means) = replay(r.getInt(0))
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("mean_micro") == means(r.getInt(1)))
    }
  }

  test("sorted sink: clustered write round-trips the key-range aggregate") {
    val df = IOQueries.sinkSorted(spark, sfDir)
    val direct = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 5000)
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).head
    val got = df.head
    assert(got.getLong(0) == direct.getLong(0))
    assert(got.getDouble(1) == direct.getDouble(1))
  }

  test("global ids: contiguous 0..n-1 in doc_id order, no single-partition window") {
    val rows = Analytics.tGlobalIds(spark, sfDir).collect()
    val n = rows.length
    assert(rows.map(_.getLong(1)).toSeq == (0L until n).toSeq)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("shuffle hash: permutation is reproducible run-over-run") {
    val a = Analytics.tShuffleHash(spark, sfDir, n = 50).collect().map(_.getLong(0)).toSeq
    val b = Analytics.tShuffleHash(spark, sfDir, n = 50).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.toSet.size == 50)
  }

  test("table diff: statuses partition the key universe") {
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey")
    val keys = o.collect().map(_.getLong(0))
    val v1 = keys.filter(_ % 11 != 0).toSet
    val v2 = keys.filter(_ % 13 != 0).toSet
    val expected = Map(
      "added" -> (v2 -- v1).size.toLong,
      "removed" -> (v1 -- v2).size.toLong,
      "changed" -> (v1 & v2).count(k => k % 7 == 0).toLong,
      "unchanged" -> (v1 & v2).count(k => k % 7 != 0).toLong)
    val got = Analytics.tTableDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0))
  }

  test("plan shapes: rank-filter pushdown, distributed top-K, sort-clustered write") {
    // round 7: the rank<=1 windows became mergeable struct-max
    // aggregates outright — stronger than WindowGroupLimit pushdown:
    // no window exchange exists at all, and the map side combines
    val semantic = Dedup.semanticDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!semantic.contains("Window"),
      "dedup_semantic must not plan any window operator")
    assert(semantic.contains("partial_max(struct"),
      "keep-first must run as a map-side-combinable struct-max aggregate")
    val topg = TextQueries.textTopgrams(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(topg.contains("TakeOrderedAndProject"),
      "text_topgrams must use distributed top-K, not a global sort")
  }

  test("native global-index operator: same ids as the RDD form, distributed plan") {
    val native = Analytics.tGlobalIdsNative(spark, sfDir)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("GlobalIndex"), "custom strategy should plan the node")
    assert(plan.contains("rangepartitioning"),
      "OrderedDistribution must be satisfied by a range exchange")
    assert(!plan.contains("Window"), "no single-partition window allowed")
    val viaRdd = Analytics.tGlobalIds(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaNative = native.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaNative.toSeq == viaRdd.toSeq)
  }

  test("fvecs source: byte-range splits are record-aligned and id-stable") {
    val out = java.nio.file.Files.createTempDirectory("graft_fvecs_spec").toString + "/emb"
    graft.sources.FvecsIO.write(Tables.load(spark, sfDir, "embeddings"), out, nFiles = 3)
    val original = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // two different split plans must decode identical (id, vector) sets
    Seq("1", "4").foreach { nSplits =>
      val got = spark.read.format("graft-fvecs").option("nSplits", nSplits).load(out)
      if (nSplits == "4") assert(got.rdd.getNumPartitions > 3,
        "each file should fan out into multiple record-aligned splits")
      val rows = got.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(rows == original)
    }
  }

  test("salted join: shuffle join on (key, salt), same result as unsalted") {
    val salted = Analytics.tSaltedJoin(spark, sfDir)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "merge hint must pin the shuffle-join path")
    assert(!plan.contains("BroadcastHashJoin"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_partkey") % 20).as("k"), col("l_quantity"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select((col("o_orderkey") % 20).as("k2"), col("o_totalprice"))
      .groupBy("k2").agg(round(sum("o_totalprice"), 2).as("k_total"))
    val unsalted = li.join(ord, col("k") === col("k2"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"),
        max("k_total").as("k_total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = salted.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == unsalted)
  }

  test("vocab: contiguous ids in (freq desc, term) order") {
    val rows = TextQueries.textVocab(spark, sfDir, vocabSize = 20).collect()
    assert(rows.map(_.getAs[Int]("token_id")).toSeq == rows.indices.toSeq)
    val freqs = rows.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sortBy(-_))
  }

  test("transformWithState: final snapshots equal the batch aggregate") {
    val batch = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = graft.streaming.Events.streamTransformWithState(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("gap fill: dense calendar frame, zeros only where the rollup is silent") {
    val rows = Analytics.eGapFill(spark, sfDir).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val hours = rows.map(_.getLong(1)).distinct.length
    assert(rows.length == types * hours, "output must be the full types x hours grid")
    val nonZero = rows.count(_.getLong(2) > 0)
    val rollup = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count().count()
    assert(nonZero.toLong == rollup)
  }

  test("incremental dedup: verdicts partition the delta; exact beats near") {
    val rows = Dedup.incrementalDedup(spark, sfDir, splitAt = 400).collect()
    val deltaCount = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") >= 400).count()
    assert(rows.length.toLong == deltaCount, "one verdict per delta doc")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val verdict = r.getString(1)
      assert(Set("exact_dup", "near_dup", "new")(verdict))
      if (verdict == "new") assert(r.isNullAt(2))
      else assert(r.getLong(2) < 400, "evidence must come from the base corpus")
    }
  }

  test("bloom semi-join: bloom prefilter + exact verify equals the plain semi-join") {
    val got = Analytics.qBloomSemi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val dim = Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val plain = Tables.load(spark, sfDir, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain)
  }

  test("rolling 7d: frame sums only the days within [d-6, d]") {
    val rows = Analytics.qRolling7d(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1), r.getDouble(2)))
    val byDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (d, _, roll) =>
      val expected = (d - 6 to d).flatMap(byDay.get).sum
      assert(math.abs(roll - expected) < 0.02, s"day $d: $roll vs $expected")
    }
  }

  test("corrupt jsonl: good+corrupt partitions the source rows exactly") {
    val orders = Tables.load(spark, sfDir, "orders")
    val n = orders.count()
    val nBad = orders.filter(col("o_orderkey") % 7 === 0).count()
    val r = IOQueries.srcJsonlCorrupt(spark, sfDir).head
    assert(r.getAs[Long]("n_good") == n - nBad)
    assert(r.getAs[Long]("n_corrupt") == nBad)
  }
}
