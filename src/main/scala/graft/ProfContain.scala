package graft

import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway A/B harness for the dedup_containment hotspot: times the
  * candidate sub-pipeline vs the verify tail, and variants (no size
  * filter, checkpointed sets, count-based verify).
  */
object ProfContain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // cold
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s median=${runs(1)}%.3f min=${runs.head}%.3f")
    }

    val n = 3; val maxDf = 50; val threshold = 0.8

    // current pieces
    def setsCur() = Dedup.containmentKeptIndex(spark, dir, n, maxDf)._1
    def keptCur() = Dedup.containmentKeptIndex(spark, dir, n, maxDf)._2
    def candCur() = Dedup.containmentCandidates(spark, dir, n, maxDf)._2
    def fullCur() = SparkEntry.queries("dedup_containment")(spark, dir)

    // variant: no size filter on sets
    def setsNf() = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), Dedup.shingleHashesCol(col("text"), n).as("sh"))
    def keptNf(sets: DataFrame) = sets
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= maxDf)
    def candOf(kept: DataFrame) = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
      .distinct()
    def verifyOf(cand: DataFrame, sets: DataFrame) = cand
      .join(sets.select(col("doc_id").as("inner_id"), col("sh").as("sha")), Seq("inner_id"))
      .join(sets.select(col("doc_id").as("outer_id"), col("sh").as("shb")), Seq("outer_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("containment",
        round(col("inter").cast("double") / size(col("sha")), 4))
      .filter(col("containment") >= threshold)
      .select("inner_id", "outer_id", "containment")
      .orderBy("inner_id", "outer_id")

    // variant: count shared KEPT shingles per pair in the candidate
    // join itself (groupBy count instead of distinct), bound the full
    // intersection above by capped_inter + min(nhot_a, nhot_b), filter
    // with the bound, exact-verify survivors only
    def fullBound() = {
      val sets = setsNf()
      val idx = sets.select(col("doc_id"), explode(col("sh")).as("h"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      val kept = idx.filter(col("df") <= maxDf)
      // per-doc stats: full set size and hot-shingle count
      val stats = idx.groupBy("doc_id").agg(
        count(lit(1)).as("sz"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("nhot"))
      val counted = kept.as("a").join(kept.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
        .agg(count(lit(1)).as("capped_inter"))
      val surv = counted
        .join(stats.select(col("doc_id").as("inner_id"),
          col("sz").as("sza"), col("nhot").as("nhot_a")), Seq("inner_id"))
        .join(stats.select(col("doc_id").as("outer_id"),
          col("nhot").as("nhot_b")), Seq("outer_id"))
        .filter((col("capped_inter") + least(col("nhot_a"), col("nhot_b"))).cast("double")
          / col("sza") >= threshold - 1e-4)
        .select("inner_id", "outer_id")
      verifyOf(surv, sets)
    }

    // variant: ASYMMETRIC PREFIX filter — C(a→b) >= t implies a shares
    // >= ceil(t*sza) - nhot_a KEPT shingles with b; in global (df, h)
    // order at least one shared kept shingle then lies in a's kept
    // prefix of length nkept_a - s_min + 1. Join a-prefix vs b-full.
    def fullPrefix() = {
      val sets = setsNf()
      val idx = sets.select(col("doc_id"), size(col("sh")).as("sz"),
          explode(col("sh")).as("h"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      val kept = idx.filter(col("df") <= maxDf)
        .withColumn("pos", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "h")))
        .withColumn("nkept", count(lit(1)).over(Window.partitionBy("doc_id")))
      // s_min = ceil(t_eff*sz) - nhot, nhot = sz - nkept
      val sMin = ceil(lit(threshold - 1e-4) * col("sz")) - (col("sz") - col("nkept"))
      val pref = kept.filter(col("pos") <= col("nkept") - sMin + 1)
      val cand = pref.as("a").join(kept.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
        .distinct()
      verifyOf(cand, sets)
    }

    // bound variant, production shape: stats from sets + kept counts,
    // no forced broadcast (planner/AQE picks; stats is corpus-sized at
    // scale)
    def fullBound2() = {
      val sets = setsNf()
      val kept = keptNf(sets)
      val counted = kept.as("a").join(kept.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
        .agg(count(lit(1)).as("capped_inter"))
      val nkept = kept.groupBy("doc_id").agg(count(lit(1)).as("nkept"))
      val stats = sets.select(col("doc_id"), size(col("sh")).as("sz"))
        .join(nkept, Seq("doc_id"))
        .select(col("doc_id"), col("sz"), (col("sz") - col("nkept")).as("nhot"))
      val surv = counted
        .join(stats.select(col("doc_id").as("inner_id"),
          col("sz").as("sza"), col("nhot").as("nhot_a")), Seq("inner_id"))
        .join(stats.select(col("doc_id").as("outer_id"),
          col("nhot").as("nhot_b")), Seq("outer_id"))
        .filter((col("capped_inter") + least(col("nhot_a"), col("nhot_b"))).cast("double")
          / col("sza") >= threshold - 1e-4)
        .select("inner_id", "outer_id")
      verifyOf(surv, sets)
    }

    // bound variant, window-carry shape: sz/nhot ride the index rows
    // through the self-join and the group-by — no stats join, no
    // broadcast decision anywhere
    def fullBound3() = {
      val sets = setsNf()
      val idx = sets.select(col("doc_id"), size(col("sh")).as("sz"),
          explode(col("sh")).as("h"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      val kept = idx.filter(col("df") <= maxDf)
        .withColumn("nhot",
          col("sz") - count(lit(1)).over(Window.partitionBy("doc_id")))
      val counted = kept.as("a").join(kept.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"),
          col("a.sz").as("sza"), col("a.nhot").as("nhot_a"), col("b.nhot").as("nhot_b"))
        .agg(count(lit(1)).as("capped_inter"))
      val surv = counted
        .filter((col("capped_inter") + least(col("nhot_a"), col("nhot_b"))).cast("double")
          / col("sza") >= threshold - 1e-4)
        .select("inner_id", "outer_id")
      verifyOf(surv, sets)
    }

    args.lift(1).getOrElse("all") match {
      case "bound3" =>
        time("full(bound3)")(fullBound3())
        val a = fullCur().collect().map(_.toString).sorted
        val b = fullBound3().collect().map(_.toString).sorted
        println(s"rows cur=${a.length} bound3=${b.length} equal=${a.sameElements(b)}")
      case "bound2" =>
        time("full(bound2)")(fullBound2())
        val a = fullCur().collect().map(_.toString).sorted
        val b = fullBound2().collect().map(_.toString).sorted
        println(s"rows cur=${a.length} bound2=${b.length} equal=${a.sameElements(b)}")
      case "prefix" =>
        time("full(prefix)")(fullPrefix())
        val a = fullCur().collect().map(_.toString).sorted
        val b = fullPrefix().collect().map(_.toString).sorted
        println(s"rows cur=${a.length} prefix=${b.length} equal=${a.sameElements(b)}")
      case "pieces" =>
        time("sets(current)")(setsCur())
        time("kept(current)")(keptCur())
        time("cand(current)")(candCur())
        time("full(current)")(fullCur())
        println(s"cand rows=${candCur().count()}  kept rows=${keptCur().count()}")
      case "nf" =>
        time("full(no-size-filter)")(verifyOf(candOf(keptNf(setsNf())), setsNf()))
      case "ckpt" =>
        time("full(ckpt sets)") {
          val s = setsNf().localCheckpoint()
          verifyOf(candOf(keptNf(s)), s)
        }
      case "bound" =>
        time("full(bound)")(fullBound())
        // equivalence check
        val a = fullCur().collect().map(_.toString).sorted
        val b = fullBound().collect().map(_.toString).sorted
        println(s"rows cur=${a.length} bound=${b.length} equal=${a.sameElements(b)}")
      case "all" =>
        time("full(current)")(fullCur())
        time("full(no-size-filter)")(verifyOf(candOf(keptNf(setsNf())), setsNf()))
        time("full(ckpt sets)") {
          val s = setsNf().localCheckpoint()
          verifyOf(candOf(keptNf(s)), s)
        }
    }
    spark.stop()
  }
}
