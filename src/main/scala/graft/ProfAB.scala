package graft

import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B timing harness: variants run ALTERNATELY in one
  * JVM (A B A B …), so box drift and heap state hit both sides
  * equally — the instrument for sub-second deltas the cross-JVM
  * QuickTime readings cannot resolve (±40% swings observed r14).
  *
  * `runMain graft.ProfAB <case> <sfDir> [reps=4]`
  */
object ProfAB {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- ngram-jaccard: sets WITH the size filter (the pre-r14 form) ---
    def ngramWithFilter(): DataFrame = {
      val threshold = 0.5; val n = 3
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
      cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard",
          round(col("inter").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }

    // --- minhash WITHOUT the cand checkpoint (the pre-r14 form) ---
    def minhashNoCkpt(): DataFrame = {
      val threshold = 0.5; val n = 3; val k = 128; val bands = 32
      val r = k / bands
      val documents = Tables.load(spark, dir, "documents")
      val sigs = documents
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), Dedup.minhashSignature(col("text"), n, k).as("sig"))
      val banded = sigs.select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(slice(col("sig"), b * r + 1, lit(r))).as("bh")))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val shSets = documents.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), Dedup.shingleHashesCol(col("text"), n).as("sh"))
      val withSets = cand
        .join(shSets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
        .join(shSets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      withSets
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }

    val (aLabel, a, bLabel, b): (String, () => DataFrame, String, () => DataFrame) =
      which match {
        case "ngram" => ("current", () => SparkEntry.queries("dedup_ngram_jaccard")(spark, dir),
          "with-filter", () => ngramWithFilter())
        case "minhash" => ("current(ckpt)", () => SparkEntry.queries("dedup_minhash")(spark, dir),
          "no-ckpt", () => minhashNoCkpt())
      }

    noop(a()); noop(b()) // cold both
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime(); noop(a()); as += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); noop(b()); bs += (System.nanoTime() - t1) / 1e9
    }
    def stats(x: Seq[Double]) = f"median=${x.sorted.apply(x.size / 2)}%.3f min=${x.min}%.3f all=${x.map(v => f"$v%.2f").mkString(",")}"
    println(s"A $aLabel ${stats(as.toSeq)}")
    println(s"B $bLabel ${stats(bs.toSeq)}")
    spark.stop()
  }
}
