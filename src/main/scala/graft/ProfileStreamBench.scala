package graft

/** Isolated runner for the streaming micro-batch throughput block
  * (graft.streaming.StreamBench) — the same entries Bench folds into
  * its `streaming` JSON field, printed one per line for iteration.
  */
object ProfileStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entries = graft.streaming.StreamBench.run(spark, sfDir)
    entries.foreach { e =>
      println(f"STREAM ${e.name}%-22s med=${e.sec}%6.2fs min=${e.minSec}%6.2fs " +
        f"events=${e.events} evps=${e.eventsPerSec}%,.0f jobs=${e.jobs}")
    }
    spark.stop()
  }
}
