package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("salted aggregation equals the unsalted aggregate") {
    val salted = Relational.tSaltedAgg(spark, sfDir).collect()
    val plain = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("approx count-distinct within 5% of exact") {
    val approx = Relational.approxDistinct(spark, sfDir).collect()(0)
    val exact = Relational.qDistinct(spark, sfDir).collect()(0)
    val pairs = Seq(
      (approx.getLong(0), exact.getLong(0)),
      (approx.getLong(1), exact.getLong(1)))
    pairs.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx=$a exact=$e")
    }
  }
}
