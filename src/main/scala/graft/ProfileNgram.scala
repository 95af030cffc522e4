package graft

/** Throwaway profiling harness for the ngram-jaccard hotspot. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = graft.operators.Dedup.ngramJaccard(spark, dir)
    println(s"[prof] pairs=${time("ngramJaccard cold")(df.count())}")
    println(s"[prof] pairs=${time("ngramJaccard warm")(
      graft.operators.Dedup.ngramJaccard(spark, dir).count())}")
    spark.stop()
  }
}
