package graft

import graft.operators.{Dedup, Similarity}
import graft.queries.{Relational, TextQueries}
import org.apache.spark.sql.functions._

/** Round-4 specs: semantics of the new training-pipeline operators —
  * exact-substring dedup, Gopher quality rules, Z-order clustering.
  */
class Round5Spec extends SparkSpec {

  test("substring dedup: every boilerplate doc shares the planted spans") {
    // withBoilerplate appends the same 11-token suffix to every 7th doc
    // → 11 - 8 + 1 = 4 fully-interior shared 8-token spans per doc.
    val out = Dedup.substringDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(planted.length >= 2, "need at least two boilerplate docs")
    planted.foreach { id =>
      assert(out.contains(id), s"boilerplate doc $id missing from output")
      assert(out(id) >= 4, s"doc $id has ${out(id)} dup spans, expected >= 4")
    }
  }

  test("substring dedup: no false positives on unique spans") {
    // every reported span fans out to >= 2 docs by construction
    val maxDocs = Dedup.substringDedup(spark, sfDir)
      .agg(min("max_span_docs")).collect().head.getLong(0)
    assert(maxDocs >= 2)
  }

  test("gopher rules: keep is exactly the conjunction of the flags") {
    val df = TextQueries.textGopherRules(spark, sfDir)
    val bad = df.filter(
      col("keep") =!= (col("r_nwords") && col("r_wlen") && col("r_symbol") &&
        col("r_digit") && col("r_stop"))).count()
    assert(bad === 0)
    // thresholds actually discriminate on this corpus: both keep
    // outcomes occur, so the gate is not vacuous
    val kept = df.filter(col("keep")).count()
    assert(kept > 0 && kept < df.count())
  }

  test("approx percentiles within 2% of exact discrete percentiles") {
    val exact = Relational.qQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val errs = Relational.qQuantilesApprox(spark, sfDir).collect().flatMap { r =>
      val ex = exact(r.getString(0))
      (1 to 4).map { i =>
        val (a, e) = (r.getDouble(i), ex(i - 1))
        val rel = math.abs(a - e) / math.max(e, 1.0)
        assert(rel < 0.02, s"flag=${r.getString(0)} p$i approx=$a exact=$e")
        rel
      }
    }
    RecallLog.record("q_quantiles_approx", "max_rel_error", errs.max)
  }

  test("scd2: version chains are contiguous, dated, and single-current") {
    val rows = Relational.tScd2(spark, sfDir).collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to vs.length), s"custkey $k versions not contiguous")
      assert(vs.count(_.getBoolean(5)) == 1, s"custkey $k current-row count != 1")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(4) == b.get(3), s"custkey $k range gap at v${b.getInt(1)}")
          assert(a.getString(2) != b.getString(2), s"custkey $k uncollapsed same-status version")
        case _ =>
      }
    }
  }

  test("scd2: both windows share ONE hash exchange") {
    // exchanges exist only in the PREPARED plan, and AQE hides its
    // subtree from collect() until execution — run the query, then
    // count exchanges in the finalized adaptive plan
    val df = Relational.tScd2(spark, sfDir)
    df.collect()
    // the adaptive toString prints final AND initial plans — scope the
    // count to the final section
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
  }

  test("random projection preserves norms (JL unbiasedness)") {
    // E‖y‖² = ‖x‖² for ±1/√k entries: individual ratios scatter with
    // std ≈ √(2/k) ≈ 0.35 at k=16, the corpus mean must sit near 1
    val ratios = Similarity.embRproj(spark, sfDir)
      .join(Similarity.embNorm(spark, sfDir), "vec_id")
      .select((col("norm_micro") / 1e6 / col("l2_norm")).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.forall(r => r > 0.2 && r < 2.5),
      s"ratio outlier: ${ratios.filterNot(r => r > 0.2 && r < 2.5).mkString(",")}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.9 && mean < 1.1, s"mean norm ratio $mean")
  }

  test("graft_rproj is callable from SQL and agrees with the Column path") {
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb_r5")
    val sql = spark.sql(
      """SELECT vec_id, round(element_at(graft_rproj(embedding, 16), 1) * 1e6) AS y1
        |FROM emb_r5""".stripMargin)
    val viaCol = Similarity.embRproj(spark, sfDir)
      .select(col("vec_id"), col("y1_micro").cast("double").as("y1"))
    assert(sql.exceptAll(viaCol).count() === 0)
  }

  test("z-order buckets are tight rectangles in BOTH dimensions") {
    // bucket = top 8 bits of the 20-bit interleaved key → each bucket
    // fixes the high 4 bits of each 10-bit dimension, a 64x64 box. A
    // plain sort on x would give y-extents spanning the whole domain.
    val viol = Relational.tZorder(spark, sfDir)
      .filter(col("max_cust") - col("min_cust") > 63 ||
        col("max_band") - col("min_band") > 63)
      .count()
    assert(viol === 0)
  }
}
