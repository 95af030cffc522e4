package graft
object ProfRuns {
  def main(args: Array[String]): Unit = {
    val q = args(0); val dir = args(1); val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Double = {
      graft.operators.Graph.dropSharedCache(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to n) {
      val t = run()
      val persisted = spark.sparkContext.getPersistentRDDs.size
      val mem = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1024*1024)
      println(f"RUN $i t=$t%.2f persistedRDDs=$persisted usedHeapMB=$mem")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
