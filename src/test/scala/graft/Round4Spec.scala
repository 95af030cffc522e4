package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 specs: the scale-shape fixes to the ANN operators (IVF cell
  * assignment, blocked/bucketed kNN join) — plan-shape assertions plus
  * exactness/recall against the simple broadcast oracles they replace.
  */
class Round4Spec extends SparkSpec {

  private def knnSet(rows: Array[Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(2))).toSet

  lazy val exactKnn: Array[Row] = Similarity.knnJoin(spark, sfDir).collect()

  test("IVF cell assignment is a narrow projection: no exchange, no window") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = e.orderBy("vec_id").limit(4).collect().map(r =>
      r.getAs[scala.collection.Seq[Float]]("embedding").toSeq.map(_.toDouble)).toSeq
    val plan = Similarity.assignCells(e, cents).queryExecution.executedPlan
    assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      s"assignment planned an exchange:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"assignment planned a window:\n$plan")
  }

  test("native nearest-centroid argmax agrees with the crossJoin+window argmax") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(100)
    val cents = e.orderBy("vec_id").limit(5).collect().map(r =>
      r.getAs[scala.collection.Seq[Float]]("embedding").toSeq.map(_.toDouble)).toSeq
    val native = Similarity.assignCells(e, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val spark2 = spark
    import spark2.implicits._
    val cdf = broadcast(cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid"))
    val oracle = e.crossJoin(cdf)
      .withColumn("sim", VectorFunctions.cosineBuiltin(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == oracle)
  }

  test("blocked kNN join equals the full-broadcast exact join") {
    val blocked = exactKnn.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val oracle = Similarity.knnJoinBroadcast(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(blocked.toSeq == oracle.toSeq)
  }

  // floor = measured (0.899 at r05) minus margin, the D5 pin pattern
  test("LSH kNN join: recall >= 0.85 vs exact, rank contract holds") {
    val approx = Similarity.knnJoinLsh(spark, sfDir).collect()
    approx.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq == (1 to byRk.length))
      assert(byRk.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    val recall = knnSet(approx).intersect(knnSet(exactKnn)).size.toDouble / exactKnn.length
    RecallLog.record("ann_knn_lsh", "recall_vs_exact", recall)
    assert(recall >= 0.85, s"recall=$recall")
  }

  test("warehouse writer: replace/append/fail through the JDBC-shaped interface") {
    val wh: graft.sinks.WarehouseWriter = new graft.sinks.FileWarehouse(
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    val spark2 = spark
    import spark2.implicits._
    val batch = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(!wh.exists(spark, "t"))
    wh.write(batch, "t", "replace")
    assert(wh.read(spark, "t").count() == 2)
    wh.write(batch, "t", "append")
    assert(wh.read(spark, "t").count() == 4)
    intercept[Throwable] { wh.write(batch, "t", "fail") }
    assert(wh.read(spark, "t").count() == 4, "failed write must leave the table untouched")
    wh.write(batch, "t", "replace")
    assert(wh.read(spark, "t").count() == 2)
    assert(wh.exists(spark, "t"))
    intercept[RuntimeException] { wh.write(batch, "t", "bogus_mode") }
  }

  test("kNN join top-k aggregate keeps candidate rows out of the shuffle") {
    val plan = Similarity.knnJoin(spark, sfDir).queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"exact kNN join should rank via the mergeable aggregate, not a window:\n$plan")
  }
}
