package graft

import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway profiling harness for the ngram-jaccard hotspot: A/B of
  * the array_intersect verify (re-runs ShingleHashes over the corpus
  * on both pair sides) vs an index-reuse verify (intersection counted
  * from the already-exploded inverted index, scoped to candidate docs).
  */
object ProfileNgram {

  def indexVerifyVariant(spark: SparkSession, dir: String,
                         threshold: Double = 0.5, n: Int = 3): DataFrame = {
    val sets = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), Dedup.shingleHashesCol(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sz = size(col("sh"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val idx = sets.select(col("doc_id"), sz.as("sz"), explode(col("sh")).as("h"))
    val prefix = idx
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "h")))
      .filter(col("pos") <= prefixLen)
      .select("doc_id", "sz", "h", "pos")
    val minInter = ceil(lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") >= ceil(lit(threshold) * col("a.sz")) &&
          col("a.sz") >= ceil(lit(threshold) * col("b.sz")) &&
          lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >= minInter)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // the candidate list is tiny (~true pair count); materializing it
      // lets both consumers below reuse it instead of re-running the
      // whole prefix pipeline
      .localCheckpoint()
    // verify from the index: intersection = count of shared h between
    // candidate docs; the index rows for candidate docs only (broadcast
    // semi filter), so no second ShingleHashes pass over the corpus
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    val idxc = idx.join(broadcast(candDocs), Seq("doc_id"))
    idxc.as("x").join(idxc.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy("doc_a", "doc_b", "sza", "szb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def gc(): Unit = { spark.catalog.clearCache(); System.gc() }
    for (r <- 1 to 3) {
      gc(); time(s"current r$r")(noop(Dedup.ngramJaccard(spark, dir)))
      gc(); time(s"indexVerify r$r")(noop(indexVerifyVariant(spark, dir)))
    }
    // parity
    val a = Dedup.ngramJaccard(spark, dir).collect().map(_.toSeq).toSet
    val b = indexVerifyVariant(spark, dir).collect().map(_.toSeq).toSet
    println(s"[prof] parity=${a == b} (${a.size} vs ${b.size})")
    spark.stop()
  }
}
