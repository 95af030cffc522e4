package graft

import graft.operators.Dedup
import org.apache.spark.sql.Row

/** Exactness/recall bounds for the probabilistic dedup ops (D3/D4) that
  * have no SQL oracle — the deterministic counterpart (D2) is their
  * ground truth.
  */
class DedupSpec extends SparkSpec {

  private def pairSet(rows: Array[Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] =
    pairSet(Dedup.ngramJaccard(spark, sfDir, threshold = 0.5).select("doc_a", "doc_b").collect())

  test("exact n-gram jaccard finds the planted near-dup pairs") {
    assert(exactPairs.nonEmpty, "testdata should contain planted near-dups")
  }

  test("minhash-LSH verified output is a subset of exact pairs (no false positives)") {
    val mh = pairSet(Dedup.minhashLsh(spark, sfDir, threshold = 0.5).select("doc_a", "doc_b").collect())
    assert(mh.subsetOf(exactPairs), s"false positives: ${mh.diff(exactPairs)}")
  }

  test("minhash-LSH recall >= 0.9 on exact pairs") {
    val mh = pairSet(Dedup.minhashLsh(spark, sfDir, threshold = 0.5).select("doc_a", "doc_b").collect())
    val recall = mh.intersect(exactPairs).size.toDouble / exactPairs.size
    RecallLog.record("dedup_minhash", "recall_vs_exact", recall)
    assert(recall >= 0.9, s"recall=$recall exact=${exactPairs.size} mh=${mh.size}")
  }

  test("minhash-LSH tuned: the D19 planner's split drives D3 end-to-end at the recall floor") {
    // planner propagation: the tuned operator runs the EXACT split
    // bandPlan flags is_chosen — not a hand constant that happens to
    // agree today
    val (bands, rows) = Dedup.chosenBandSplit(spark, sfDir, k = 128, threshold = 0.5)
    assert(bands * rows == 128)
    val tuned = pairSet(Dedup.minhashLshTuned(spark, sfDir, threshold = 0.5)
      .select("doc_a", "doc_b").collect())
    val manual = pairSet(Dedup.minhashLsh(spark, sfDir, threshold = 0.5, bands = bands)
      .select("doc_a", "doc_b").collect())
    assert(tuned == manual, "tuned output must equal D3 at the planned split")
    // same exact-verify contract as D3: no false positives, floor recall
    assert(tuned.subsetOf(exactPairs), s"false positives: ${tuned.diff(exactPairs)}")
    val recall = tuned.intersect(exactPairs).size.toDouble / exactPairs.size
    RecallLog.record("dedup_minhash_tuned", "recall_vs_exact", recall)
    RecallLog.record("dedup_minhash_tuned", "planned_bands", bands.toDouble)
    assert(recall >= 0.9, s"recall=$recall at planned split ($bands x $rows)")
    // a HIGH threshold must plan harder pruning (fewer bands, wider
    // rows) than a low one — the monotonicity that makes the planner
    // a dial instead of a lookup
    val (bandsHi, _) = Dedup.chosenBandSplit(spark, sfDir, k = 128, threshold = 0.9)
    assert(bandsHi <= bands, s"0.9-threshold plan $bandsHi bands vs $bands at 0.5")
  }

  test("simhash banding finds every pair within the hamming budget (pigeonhole exactness)") {
    // brute-force the true hamming<=3 pairs from the signatures and
    // compare with the banded join's output
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val sigs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), Dedup.simhash64(TextFunctions.tokens(col("text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val banded = pairSet(Dedup.simhashNearDup(spark, sfDir, maxHamming = 3)
      .select("doc_a", "doc_b").collect())
    RecallLog.record("dedup_simhash", "recall_vs_bruteforce",
      if (truth.isEmpty) 1.0 else banded.intersect(truth).size.toDouble / truth.size)
    assert(banded == truth, s"banded=${banded.size} truth=${truth.size}")
  }

  test("exact dedup groups every document exactly once") {
    val total = Dedup.exact(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()(0).getLong(0)
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(total == docs)
  }
}
