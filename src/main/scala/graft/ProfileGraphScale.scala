package graft

/** Perf-repro harness for the round-7 graph scale-step (VERDICT r6
  * #2/#4): times g_pagerank / g_kcore / g_clustering at 1× and the
  * 10× trade-table blow-up with the Bench semantics (shared G2/G8
  * cache dropped before every timed run), printing per-query medians
  * and the step ratio. The full Bench emits the same block; this
  * isolates it for iteration.
  */
object ProfileGraphScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaled = Bench.ensureScaled(spark, sfDir, 10)
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def med(name: String, dir: String): Double = {
      def run(): Double = {
        graft.operators.Graph.dropSharedCache(spark)
        time(SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save())
      }
      run()
      spark.catalog.clearCache(); System.gc()
      Seq.fill(3)(run()).sorted.apply(1)
    }
    Seq("g_pagerank", "g_kcore", "g_clustering").foreach { q =>
      val b = med(q, sfDir)
      val s = med(q, scaled)
      println(f"SCALE $q base=$b%.2f scaled=$s%.2f ratio=${s / b}%.2f")
    }
    spark.stop()
  }
}
