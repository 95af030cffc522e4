package graft

import graft.queries.TextQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Round-6 specs: the incremental BPE trainer at real vocab sizes.
  *
  * The round-5 weakness was architectural: one Spark job per merge
  * round cannot reach 30–50k-merge vocabularies (driver scheduling
  * throughput, not data volume). The rewrite keeps corpus-scale work
  * in ONE distributed (word, freq) aggregate and trains driver-side
  * over the vocab-bounded type table with incrementally-maintained
  * pair counts. These specs pin the three claims that make that safe:
  * exactness (differential vs a naive full-recount replay), O(1) job
  * count in nMerges, and per-round work ∝ affected-word mass.
  */
class Round10Spec extends SparkSpec {

  /** Naive reference trainer: full positional pair recount + argmax
    * with the (count desc, pair asc) tie-break + greedy splice of
    * EVERY word, every round — the semantics the round-5 Spark loop
    * executed, kept as the differential oracle for the incremental
    * trainer.
    */
  private def naiveBpe(types: Array[(String, Long)], nMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = types.map { case (w, f) => (w.toCharArray.map(_.toString), f) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          counts.update((s(i), s(i + 1)), counts.getOrElse((s(i), s(i + 1)), 0L) + f)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val (p, n) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, p._1, p._2, n))
        words = words.map { case (s, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == p._1 && s(i + 1) == p._2) {
              out += (p._1 + p._2); i += 2
            } else { out += s(i); i += 1 }
          }
          (out.toArray, f)
        }
      }
    }
    merges.result()
  }

  private def typeTable(dir: String): Array[(String, Long)] = {
    import spark.implicits._
    val toksCol = split(trim(regexp_replace(lower(col("text")), "[^a-z ]+", " ")), " ", -1)
    Tables.load(spark, dir, "documents")
      .select(explode(toksCol).as("word"))
      .filter(length(col("word")) > 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
  }

  test("incremental BPE == naive full-recount BPE for 64 merges on real data") {
    val types = typeTable(sfDir)
    val expected = naiveBpe(types, 64)
    val (got, _, _) = TextQueries.bpeLearnStats(spark, sfDir, 64)
    assert(got == expected,
      s"first divergence: ${got.zip(expected).find { case (a, b) => a != b }}")
    RecallLog.record("text_bpe", "exact_match_vs_recount_64", 1.0)
  }

  test("BPE Spark job count is O(1) in nMerges") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = TextQueries.textBpe(spark, sfDir, nMerges = 512).collect()
      org.apache.spark.graft.TestListenerBus.drain(spark.sparkContext)
      // the round-5 loop ran >= 3 jobs PER MERGE (1536+ here); the
      // rewrite runs the type aggregate + the result collect only —
      // a generous ceiling still catches any per-merge job creep
      assert(jobs.get() <= 16, s"jobs=${jobs.get()} for ${merges.length} merges")
      assert(merges.length > 64, s"only ${merges.length} merges learned")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("BPE per-round work is proportional to affected-word mass") {
    val (merges, _, touched) = TextQueries.bpeLearnStats(spark, sfDir, 64)
    val nTypes = typeTable(sfDir).length
    assert(merges.length == 64)
    assert(touched.length == 64)
    // a full recount rewrites nTypes words per round; the incremental
    // trainer must touch only the words containing the merged pair —
    // on this corpus that is a small fraction of rounds * nTypes
    val full = 64L * nTypes
    assert(touched.map(_.toLong).sum * 4 < full,
      s"touched=${touched.sum} vs full-recount $full (nTypes=$nTypes)")
    // and no single round may silently degrade to a full rewrite
    assert(touched.max < nTypes, s"round touched ${touched.max} of $nTypes types")
  }
}
