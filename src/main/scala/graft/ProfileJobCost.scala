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
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 10).foreach(_ => spark.range(1).count())
    val t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.range(1).count())
    val perJob = (System.nanoTime() - t0) / 1e6 / 100
    println(f"JOBCOST per-trivial-job ms=$perJob%.2f")
    val t1 = System.nanoTime()
    (1 to 20).foreach(_ => spark.range(0L, 1L << 20, 1L, 32).selectExpr("sum(id)").head())
    val perShuffle = (System.nanoTime() - t1) / 1e6 / 20
    println(f"JOBCOST per-32task-agg ms=$perShuffle%.2f")
    spark.stop()
  }
}
