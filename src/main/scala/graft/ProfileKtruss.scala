package graft

/** Bench-semantics isolation for g_ktruss (shared cache dropped per
  * run — the instrument the committed bench uses).
  */
object ProfileKtruss {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def run(): Double = {
      graft.operators.Graph.dropSharedCache(spark)
      time(SparkEntry.queries(sys.env.getOrElse("PK_Q","g_ktruss"))(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    run()
    spark.catalog.clearCache(); System.gc()
    val runs = Seq.fill(3)(run()).sorted
    println(s"KTRUSS bench-semantics median=${runs(1)} min=${runs.head}")
    spark.stop()
  }
}
