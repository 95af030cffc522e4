package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-10 batch-2 specs: HyperBall (G12) — the sketch is graded
  * against EXACT BFS ball sizes on the same graphs, the error is
  * measured and recorded (VERDICT r9 "Next round" #4), and the
  * effective-diameter readout is pinned on hand data where the true
  * diameter is known by construction.
  */
class Round22Spec extends SparkSpec {

  /** Exact |B(v, r)| for every node and radius by BFS set expansion —
    * V·ball state, fine at spec scale, the quadratic form the sketch
    * exists to avoid at 100 TB.
    */
  private def exactBalls(pairs: org.apache.spark.sql.DataFrame,
                         iters: Int): Map[(Long, Int), Long] = {
    val edges = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var reach = edges.select(col("src").as("node"), col("src").as("member")).distinct()
    val out = scala.collection.mutable.Map[(Long, Int), Long]()
    def record(r: Int): Unit =
      reach.groupBy("node").agg(count(lit(1)).as("c")).collect()
        .foreach(row => out((row.getLong(0), r)) = row.getLong(1))
    record(0)
    for (r <- 1 to iters) {
      reach = reach
        .unionByName(edges
          .join(reach.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("member")))
        .distinct().localCheckpoint()
      record(r)
    }
    out.toMap
  }

  test("g_hyperball: hand graph — ball estimates track exact sizes and the effective diameter is the true one") {
    val spark2 = spark
    import spark2.implicits._
    // a path 1-2-3-4-5 plus a pendant 6 on node 3: diameter 3
    // (1..5's far ends), every exact ball size known by construction
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .toDF("src", "dst")
    val iters = 4
    val est = Graph.hyperballNodes(spark, pairs, iters, b = 7).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2) / 1e6).toMap
    val exact = exactBalls(pairs, iters)
    assert(est.keySet == exact.keySet)
    // tiny sets sit in the linear-counting regime: each estimate must
    // round to within 1 of the true ball size
    exact.foreach { case (k, truth) =>
      assert(math.abs(est(k) - truth) <= math.max(1.0, 0.15 * truth),
        s"ball $k: est ${est(k)} vs exact $truth")
    }
    // the radius readout flags the true effective diameter: ≥90% of
    // reachable pairs are within distance 2 here (32/36), 100% at 3
    val radii = Graph.hyperballNodes(spark, pairs, iters, b = 7)
      .groupBy("r").agg(sum("ball_micro").as("mass"))
      .orderBy("r").collect().map(r => (r.getInt(0), r.getLong(1)))
    val finalMass = radii.last._2
    val effEst = radii.find(_._2 * 10 >= 9L * finalMass).get._1
    val exactMass = (0 to iters).map(r =>
      exact.collect { case ((_, rr), c) if rr == r => c }.sum)
    val effExact = exactMass.indexWhere(_ * 10 >= 9L * exactMass.last)
    assert(effEst == effExact,
      s"effective diameter: est $effEst vs exact $effExact")
  }

  test("g_hyperball: corpus graph — per-node and aggregate error within the HLL bound, recorded") {
    val iters = 6
    val pairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val est = Graph.hyperballNodes(spark, pairs, iters, b = 7).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2) / 1e6).toMap
    val exact = exactBalls(pairs, iters)
    assert(est.keySet == exact.keySet, "sketch must cover every (node, radius)")
    val relErrs = exact.toSeq.map { case (k, truth) =>
      math.abs(est(k) - truth) / math.max(1.0, truth.toDouble) }
    val meanErr = relErrs.sum / relErrs.size
    val p95Err = relErrs.sorted.apply((relErrs.size * 95) / 100)
    // per-radius AGGREGATE mass (what the entry's radius table and the
    // effective diameter read) — per-node noise averages out
    val radiusErrs = (0 to iters).map { r =>
      val e = est.collect { case ((_, rr), v) if rr == r => v }.sum
      val t = exact.collect { case ((_, rr), c) if rr == r => c }.sum.toDouble
      math.abs(e - t) / t
    }
    RecallLog.record("g_hyperball", "mean_rel_err", meanErr)
    RecallLog.record("g_hyperball", "p95_rel_err", p95Err)
    RecallLog.record("g_hyperball", "radius_mass_rel_err_max", radiusErrs.max)
    // m=128 registers: 1.04/sqrt(m) ≈ 9.2% standard error per node;
    // floors set at measured-plus-margin (the D5 pin pattern)
    assert(meanErr <= 0.12, s"mean per-node error $meanErr")
    assert(radiusErrs.max <= 0.08, s"radius-mass error ${radiusErrs.max}")
    // the entry's radius table agrees with the exact effective
    // diameter on the corpus graph
    val eff = Graph.hyperball(spark, sfDir, iters = iters).collect()
      .filter(_.getBoolean(4)).map(_.getInt(0)).head
    val exactMass = (0 to iters).map(r =>
      exact.collect { case ((_, rr), c) if rr == r => c }.sum)
    val effExact = exactMass.indexWhere(_ * 10 >= 9L * exactMass.last)
    assert(math.abs(eff - effExact) <= 1,
      s"effective diameter: sketch $eff vs exact $effExact")
  }
}
