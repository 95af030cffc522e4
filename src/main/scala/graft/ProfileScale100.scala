package graft

import org.apache.spark.sql.DataFrame

/** Two-decade (100×) scale pin for the four worst 10×-ratio operators
  * (VERDICT r8 "Next round" #3: g_clustering 10.26, text_transfer
  * 7.63, q_pit_join 7.50, g_kcore 7.46 — all measured only across ONE
  * decade before this harness).
  *
  * Decades: sf0.01 (real) → sf0.1 (real) → sf1 VOLUME via the bench's
  * own constant-density 10× blow-up of sf0.1 (Bench.ensureScaled —
  * disconnected key-offset replicas, so degree/duplicate density is
  * invariant while node/edge/doc mass grows 10×). Caveat stated with
  * the numbers: the first decade crosses two REAL generations whose
  * density is only approximately constant; the second decade is
  * constant-density by construction, which is exactly the law being
  * tested.
  *
  * Method matches Bench's scale step: warm median of 3 (cold run
  * discarded), Graph.dropSharedCache before every run so the shared
  * G2/G8 triangle pass is rebuilt per measurement, noop-sink
  * materialization.
  */
object ProfileScale100 {

  private val ops = Seq("g_clustering", "g_kcore", "text_transfer", "q_pit_join")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeOne(name: String, dir: String): Double = {
      graft.operators.Graph.dropSharedCache(spark)
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    def median(name: String, dir: String): Double = {
      timeOne(name, dir) // cold
      spark.catalog.clearCache(); System.gc()
      Seq.fill(3)(timeOne(name, dir)).sorted.apply(1)
    }

    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    println("building sf1-volume blow-up (cached after first run)...")
    val sf1 = Bench.ensureScaled(spark, sf01, 10)

    println(f"${"op"}%-16s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"sf1"}%8s ${"d1_ratio"}%9s ${"d2_ratio"}%9s")
    ops.foreach { op =>
      val t1 = median(op, sf001)
      val t2 = median(op, sf01)
      val t3 = median(op, sf1)
      println(f"$op%-16s $t1%8.2f $t2%8.2f $t3%8.2f ${t2 / t1}%9.2f ${t3 / t2}%9.2f")
    }
    spark.stop()
  }
}
