package graft

/** Ad-hoc per-query timing harness: `runMain graft.QuickTime <name>
  * <sfDir> [<name> <sfDir> ...]` — cold run + 3 warm runs per pair,
  * median/min to stdout. The surgical companion to [[Bench]] (which
  * runs the whole suite): isolating one query rules out the GC/heap
  * interference a long bench session accumulates before its tail
  * entries (observed: a 3× inflated single-run scale-step number that
  * vanished in isolation).
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    args.grouped(2).foreach { case Array(name, dir) =>
      val fn = SparkEntry.queries(name)
      time(fn(spark, dir).write.format("noop").mode("overwrite").save()) // cold
      val runs = Seq.fill(3)(time(
        fn(spark, dir).write.format("noop").mode("overwrite").save())).sorted
      println(s"TIME $name $dir median=${runs(1)} min=${runs.head}")
    }
    spark.stop()
  }
}
