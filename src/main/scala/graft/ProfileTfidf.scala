package graft

/** Throwaway: warm-timing probe for the tf-idf df-window rework. */
object ProfileTfidf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      time(s"tfidf r$r")(noop(graft.queries.TextQueries.textTfidf(spark, dir)))
    }
    spark.stop()
  }
}
