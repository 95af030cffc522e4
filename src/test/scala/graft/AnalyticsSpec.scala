package graft

import graft.functions.Aggregators
import graft.queries.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

/** Property specs for the analytics/extension batch (SURVEY.md §2
  * Q25–Q27, T9–T10, E13–E14). Value-level equality is covered by the
  * DuckDB oracle gate; these check internal invariants and the
  * extension points.
  */
class AnalyticsSpec extends SparkSpec {

  test("funnel stages are monotone non-increasing") {
    val byStage = Analytics.funnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage.keySet == Set("1_view", "2_click_after_view", "3_purchase_after_click"))
    assert(byStage("1_view") >= byStage("2_click_after_view"))
    assert(byStage("2_click_after_view") >= byStage("3_purchase_after_click"))
  }

  test("retention cohorts cover every user once; retained <= cohort size") {
    val rows = Analytics.retention(spark, sfDir).collect()
    val totalUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == totalUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("d1_retained") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("d7_retained") <= r.getAs[Long]("n_users"))
    }
  }

  test("dq rules match a driver-side replay (testdata has planted dup keys)") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity").collect()
    val expectedDups = li.groupBy(r => (r.getLong(0), r.getInt(1)))
      .values.map(_.length - 1L).sum
    val got = Analytics.dqRules(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("null_quantity") == ((0L, true)))
    assert(got("range_quantity") == ((0L, true)))
    assert(got("orphan_lineitem") == ((0L, true)))
    assert(got("dup_pk") == ((expectedDups, expectedDups == 0)))
  }

  test("unpivot round-trips the pivot cells") {
    val pivoted = queries.Relational.tPivot(spark, sfDir).collect()
    val melted = Analytics.tUnpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pivoted.foreach { r =>
      Seq("F", "O", "P").foreach { s =>
        Option(r.getAs[java.lang.Double](s)).foreach { v =>
          assert(melted((r.getString(0), s)) == v.doubleValue())
        }
      }
    }
  }

  test("outer join: nationkeys missing a side appear with zero count") {
    val rows = Analytics.qOuterJoin(spark, sfDir).collect()
    val allNations = Tables.load(spark, sfDir, "customer")
      .select("c_nationkey").distinct().count()
    assert(rows.length >= allNations)
    // at least one nation lacks negative-balance suppliers at sf0.001
    assert(rows.exists(_.getLong(2) == 0L))
  }

  test("StringMode aggregator: deterministic tie-break to smallest value") {
    import spark.implicits._
    val df = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "a"), ("g", "c"))
      .toDF("k", "v").repartition(4)
    val modeOf = udaf(Aggregators.StringMode)
    val got = df.groupBy("k").agg(modeOf(col("v")).as("m")).head.getString(1)
    assert(got == "a") // a and b tie at 2; smallest wins on any merge order
  }

  test("extensions-built session resolves graft_cosine in pure SQL") {
    // the shared fixture session is built through GraftSession, which
    // wires GraftExtensions — the function must already resolve
    GraftFunctions.register(spark) // runtime path is idempotent on top
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("ext_probe")
    val sim = spark.sql("SELECT graft_cosine(a, b) AS s FROM ext_probe").head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }
}
