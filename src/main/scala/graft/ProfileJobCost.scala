package graft

/** The per-JOB fixed-cost yardstick — the second calibration channel
  * next to [[BenchSentinel]]'s CPU probe, and the discriminator that
  * adjudicated the r11/r12 "uniform inflation on untouched entries"
  * question: entries built from MANY SMALL JOBS (parameter sweeps,
  * iterative re-rank loops, planner entries with driver collects) pay
  * `jobs × per-job-cost`, so a box whose Spark job dispatch is slow
  * inflates exactly those entries while single-scan entries barely
  * move.
  *
  * Round-12 measurements on this box: ~50–90 ms per trivial 1-task
  * job — identical on a VANILLA SparkSession (no graft extensions,
  * default confs) and at local[2]/local[8]/local[32], while raw JVM
  * thread dispatch is ~60 µs — i.e. the cost lives in Spark's job
  * machinery on THIS box generation, not in graft code (a healthy
  * box runs trivial local jobs in ~10 ms). That is what moved
  * `ann_lsh_sweep`/`emb_mmr`/`dedup_band_plan` 2–2.5× vs the r10
  * artifact with their code bit-identical. Compare this number
  * round-over-round before reading any sweep-entry delta as a
  * regression.
  */
object ProfileJobCost {
  /** One reading of the channel: (per trivial 1-task job ms, per
    * 32-task agg job ms). Callable from [[Bench]] so the committed
    * artifact carries the per-job cost beside the CPU sentinel —
    * iterative/sweep entries then self-normalize without a separate
    * runMain (VERDICT r12 #1). Counts are parameters because the
    * standalone profile wants precision (100 jobs) while the bench
    * wants a bounded probe (a 148 ms/job box must not spend 15 s on
    * calibration).
    */
  def measure(spark: org.apache.spark.sql.SparkSession,
              nTrivial: Int = 100, nAgg: Int = 20): (Double, Double) = {
    (1 to 10).foreach(_ => spark.range(1).count())
    val t0 = System.nanoTime()
    (1 to nTrivial).foreach(_ => spark.range(1).count())
    val perJob = (System.nanoTime() - t0) / 1e6 / nTrivial
    val t1 = System.nanoTime()
    (1 to nAgg).foreach(_ => spark.range(0L, 1L << 20, 1L, 32).selectExpr("sum(id)").head())
    val perShuffle = (System.nanoTime() - t1) / 1e6 / nAgg
    (perJob, perShuffle)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (perJob, perShuffle) = measure(spark)
    println(f"JOBCOST per-trivial-job ms=$perJob%.2f")
    println(f"JOBCOST per-32task-agg ms=$perShuffle%.2f")
    spark.stop()
  }
}
