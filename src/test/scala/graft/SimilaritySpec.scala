package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def topkSet(rows: Array[Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] =
    topkSet(Similarity.bruteForceTopK(spark, sfDir).select("q_id", "vec_id").collect())

  test("brute force returns k neighbors per query") {
    assert(exact.size == 10 * 5)
  }

  test("native cosine expression agrees with the sql.functions fallback") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val diff = a.crossJoin(b)
      .select(abs(
        VectorFunctions.cosine(col("ea"), col("eb")) -
          VectorFunctions.cosineBuiltin(col("ea"), col("eb"))).as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(diff < 1e-12, s"max |native - builtin| = $diff")
  }

  // Floors are measured-minus-margin (r05/r06 measurements: LSH 0.96,
  // IVF 0.90) so a quality regression fails the suite instead of
  // silently drifting in the RECALL artifact — the D5 pattern.
  test("LSH ANN recall >= 0.9 vs brute force") {
    val lsh = topkSet(Similarity.lshAnn(spark, sfDir).select("q_id", "vec_id").collect())
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    RecallLog.record("ann_lsh", "recall_vs_exact", recall)
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("IVF ANN recall >= 0.85 vs brute force") {
    val ivf = topkSet(Similarity.ivfAnn(spark, sfDir).select("q_id", "vec_id").collect())
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    RecallLog.record("ann_ivf", "recall_vs_exact", recall)
    assert(recall >= 0.85, s"recall=$recall")
  }

  test("PQ ANN recall >= 0.9 vs brute force") {
    // Lloyd-trained 256-entry codebooks (8-bit codes, the standard PQ
    // setup) + 64-candidate ADC shortlist + exact rerank. The floor is
    // the round-6 contract: the round-5 first-k-sample codebooks sat
    // at 0.76 and this pin keeps the fix from drifting back.
    val pq = topkSet(Similarity.pqAnn(spark, sfDir).select("q_id", "vec_id").collect())
    val recall = pq.intersect(exact).size.toDouble / exact.size
    RecallLog.record("ann_pq", "recall_vs_exact", recall)
    assert(recall >= 0.9, s"recall=$recall")
  }
}
