package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the LSH-ANN hotspot. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = Tables.load(spark, dir, "embeddings")
    println(s"[prof] embeddings=${time("count")(e.count())}")
    time("warm full lshAnn")(graft.operators.Similarity.lshAnn(spark, dir).count())
    time("dim head")(graft.Tables.load(spark, dir, "embeddings").select(size(col("embedding"))).limit(1).head)
    time("warm full lshAnn 2")(graft.operators.Similarity.lshAnn(spark, dir).count())
    time("warm bruteforce")(graft.operators.Similarity.bruteForceTopK(spark, dir).count())
    time("warm ivf")(graft.operators.Similarity.ivfAnn(spark, dir).count())
    spark.stop()
  }
}
