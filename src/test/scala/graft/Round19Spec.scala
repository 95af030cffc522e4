package graft

import org.apache.spark.sql.functions._

/** Round-8 (fourth batch) hand-data and mechanics specs for the five
  * new operators — the oracle-invisible half of each contract.
  */
class Round19Spec extends SparkSpec {

  test("sink_part_evolve: evolution carries old files by reference; both layouts prune to the expected sets") {
    val base = java.nio.file.Files.createTempDirectory("graft_pevolve_spec").toString
    graft.queries.IOQueries.sinkPartitionEvolve(spark, sfDir,
      baseOverride = Some(base)).collect()
    def manifest(v: Long) =
      graft.sinks.ManifestStore.at(spark, base + "/manifest", Some(v))._2
    val v1Files = manifest(1L).select("file").collect().map(_.getString(0)).toSet
    val v2 = manifest(2L).collect()
    // the old layout's files carried verbatim into the evolved version
    val v2Gen1 = v2.map(_.getAs[String]("file")).filter(_.contains("/gen1/")).toSet
    assert(v2Gen1 == v1Files, "spec evolution must not rewrite or drop old-layout files")
    // per-file partition values recorded per layout: gen1 rows carry
    // month only (priority null), gen2 rows carry both dimensions
    assert(v2.filter(_.getAs[String]("file").contains("/gen1/"))
      .forall(r => r.getAs[String]("priority") == null && r.getAs[String]("month") != null))
    assert(v2.filter(_.getAs[String]("file").contains("/gen2/"))
      .forall(r => r.getAs[String]("priority") != null && r.getAs[String]("month") != null))
    // pruning law on PARTITION TUPLES (file counts per partition are a
    // writer detail): a month+priority query selects all priorities of
    // the old layout's in-range months (residual filtering inside) but
    // exactly ONE priority slice of the new layout's
    val gen2InRange = v2.filter(r => r.getAs[String]("file").contains("/gen2/") &&
      r.getAs[String]("month") >= "1996-10" && r.getAs[String]("month") <= "1997-03")
    val tuples = gen2InRange.map(r =>
      (r.getAs[String]("month"), r.getAs[String]("priority"))).distinct
    val months = tuples.map(_._1).distinct
    val targetTuples = tuples.filter(_._2 == "1-URGENT")
    assert(targetTuples.nonEmpty && targetTuples.length == months.length,
      "the target slice must cover exactly the in-range months, once each")
    assert(tuples.length > targetTuples.length,
      "pruning must have excluded the other priority slices")
    // a range entirely on the old-layout side: the new layout
    // contributes zero files and the query must still answer
    val preOnly = graft.queries.IOQueries.sinkPartitionEvolve(spark, sfDir,
      qLo = "1996-01", qHi = "1996-06",
      baseOverride = Some(base + "_pre")).collect().head
    assert(preOnly.getAs[Long]("n") > 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base + "_pre"))
  }

  test("ts_periodogram: a planted 7-day cycle dominates; a constant series has zero power everywhere") {
    import spark.implicits._
    def series(ys: Seq[Long]) =
      ys.zipWithIndex.map { case (y, i) =>
        (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)), y)
      }.toDF("d", "y")
    // amplitude 1e6 micro, period 7: power at 7 must beat every other period
    val cyc = (0 until 70).map(t =>
      10000000L + math.round(1000000.0 * math.cos(2 * math.Pi * t / 7)))
    val dom = graft.queries.TimeSeries.periodogramOf(series(cyc))
      .filter(col("dominant")).select("period").head.getLong(0)
    assert(dom == 7L, s"planted weekly cycle must dominate, got period $dom")
    val flat = graft.queries.TimeSeries.periodogramOf(series(Seq.fill(70)(5000000L)))
      .collect()
    assert(flat.forall(_.getAs[Double]("spec_power") == 0.0),
      "a constant series mean-centers to exact zeros")
    assert(flat.forall(!_.getAs[Boolean]("dominant")),
      "zero power everywhere means NO dominant period, not an arbitrary tie-winner")
  }

  test("text_heldout: hand corpus — unseen test bigrams pay the smoothing floor, seen ones the fitted count") {
    import spark.implicits._
    // train (ids 1,2): "a b" x2 and "a c"; test (id 5): "a b a d"
    // train model: c(a,b)=2, c(a,c)=1, c_l(a)=3, vocab {a,b,c} v=3
    val docs = Seq(
      (1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "a c"),
      (5L, "s", "a b a d")
    ).toDF("doc_id", "source", "text")
    val out = graft.queries.TextQueries.textHeldoutOf(docs).collect()
    assert(out.length == 1)
    val r = out.head
    // test bigrams: (a,b) seen → ln((3+3)/(2+1)); (b,a) unseen context →
    // ln((0+3)/(0+1)); (a,d) unseen pair, seen context → ln((3+3)/(0+1))
    val exp = Seq(math.log(6.0 / 3), math.log(3.0 / 1), math.log(6.0 / 1))
      .map(x => math.round(x * 1e6))
    assert(r.getAs[Long]("n_docs") == 1L && r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("mean_surprisal_micro") == exp.sum / 3,
      s"hand-computable surprisal mismatch: ${r.getAs[Long]("mean_surprisal_micro")} vs ${exp.sum / 3}")
  }

  test("t_scale: train z-scores sum to ~0 by construction; test rows are scored on the train scale") {
    val out = graft.queries.Analytics.tScale(spark, sfDir).collect()
    val train = out.filter(_.getAs[String]("split") == "train")
    assert(train.nonEmpty)
    // each micro-rounding is off by < 0.5, so |Σ zm| < n/2 on the split
    // the stats were fitted on — a leaked full-table fit breaks this
    train.foreach { r =>
      assert(math.abs(r.getAs[Long]("sum_z_micro")) <= r.getAs[Long]("n") / 2 + 1,
        s"train z-sum must vanish for ${r.getAs[String]("grp")}: $r")
    }
    // test rows exist for every group and are NOT centered at zero by
    // construction (they carry the train moments, not their own)
    val test = out.filter(_.getAs[String]("split") == "test")
    assert(test.length == train.length)
    // independent replay of one group's stats, driver-side
    val grp = train.head.getAs[String]("grp")
    val vs = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === grp && pmod(col("o_orderkey"), lit(5)) =!= 0)
      .select(round(col("o_totalprice") * 1e6).cast("long")).collect().map(_.getLong(0))
    val n = vs.length.toDouble
    val mu = vs.map(BigDecimal(_)).sum.toDouble / n
    val sd = math.sqrt((BigDecimal(vs.length) * vs.map(v => BigDecimal(v) * BigDecimal(v)).sum
      - vs.map(BigDecimal(_)).sum * vs.map(BigDecimal(_)).sum).toDouble) / n
    val sumZ = vs.map(v => math.round((v - mu) / sd * 1e6)).sum
    assert(train.find(_.getAs[String]("grp") == grp).get.getAs[Long]("sum_z_micro") == sumZ,
      "driver replay of the train split's z-sum must match bit-for-bit")
  }

  test("dq_completeness: exactly the planted holes surface, landed counts match the source") {
    val out = graft.queries.IOQueries.dqCompleteness(spark, sfDir).collect()
    val source = graft.Tables.load(spark, sfDir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plantedHoles = source.keys.toSeq.sorted.zipWithIndex
      .collect { case (m, i) if i % 7 == 3 => m }.toSet
    val holes = out.filter(!_.getAs[Boolean]("landed"))
    assert(holes.map(_.getString(0)).toSet == plantedHoles,
      "the gate must report exactly the planted holes")
    assert(holes.forall(_.getAs[Long]("n_rows") == 0L))
    out.filter(_.getAs[Boolean]("landed")).foreach { r =>
      assert(r.getAs[Long]("n_rows") == source(r.getString(0)),
        s"landed month ${r.getString(0)} must carry the full source count")
    }
  }

  test("dq_ks_drift: identical distributions score 0; disjoint supports score the closed-form maximum") {
    import spark.implicits._
    // sources a, b identical {1,2,3} → every CDF diff is 0
    val same = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("b", 3L)).toDF("source", "v")
    val zero = graft.queries.Analytics.dqKsDriftOf(same).collect()
    assert(zero.forall(_.getAs[Long]("ks_micro") == 0L))
    // a = {1,2}, b = {10,11}: at v=2 CDF_a=1, CDF_rest=0 → KS = 1
    val disj = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L)).toDF("source", "v")
    val one = graft.queries.Analytics.dqKsDriftOf(disj).collect()
    assert(one.forall(_.getAs[Long]("ks_micro") == 1000000L),
      s"disjoint supports must hit KS = 1: ${one.mkString(",")}")
    // a shifted version of the rest: hand-computable intermediate KS —
    // a={1,2,3,4}, b={3,4,5,6}: max |CDF| gap at v=2 is 2/4 - 0 = 0.5
    val shift = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 3L), ("b", 4L), ("b", 5L), ("b", 6L)).toDF("source", "v")
    val half = graft.queries.Analytics.dqKsDriftOf(shift).collect()
    assert(half.forall(_.getAs[Long]("ks_micro") == 500000L))
    // a lone source has no complement — the statistic is undefined and
    // the row is excluded (0 would misread as "no drift")
    val lone = Seq(("a", 1L), ("a", 2L)).toDF("source", "v")
    assert(graft.queries.Analytics.dqKsDriftOf(lone).collect().isEmpty)
  }

  test("e_stream_union: feeds are disjoint and cover the table; a discriminating straggler exists") {
    val raw = graft.Tables.eventsTsAsNanosLong(spark, sfDir)
    val a = raw.filter(col("event_id") % 2 === 0).count()
    val b = raw.filter(col("event_id") % 2 === 1).count()
    assert(a > 0 && b > 0, "both feeds must carry events for the union to mean anything")
    assert(a + b == raw.count())
    // the min-vs-max watermark discrimination needs an odd-id event
    // whose window end falls in (max−2h, max−1h] — i.e. one strictly
    // inside (H−1h, H) for H = floor_hour(max−1h); without it the
    // operator still passes but pins nothing beyond parity
    val hourNs = 3600L * 1000000000L
    val mNs = raw.agg(max("ts")).head.getLong(0)
    val hBound = ((mNs - hourNs) / hourNs) * hourNs
    val straggles = raw.filter(col("event_id") % 2 === 1 &&
      col("ts") > hBound - hourNs && col("ts") < hBound).count()
    assert(straggles > 0, "testdata must offer a straggler candidate at this SF")
  }
}
