package graft

import graft.queries.IOQueries
import graft.streaming.Events
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Round-6 late specs: targeted erasure (K14) and streaming CDC (E23).
  *
  * sink_delete's oracle checks the surviving aggregate; what it cannot
  * see is the SCALE property — that untouched files were carried into
  * the next manifest version by reference instead of being rewritten.
  * These specs open the manifest store and pin exactly that, plus the
  * stream/batch convergence of the CDC feed.
  */
class Round12Spec extends SparkSpec {

  test("sink_delete: untouched files carry by reference; doomed rows are gone") {
    val base = Files.createTempDirectory("graft_erase_spec").toString
    val (lo, hi) = (100L, 120L)
    val out = IOQueries.sinkDelete(spark, sfDir, lo, hi, Some(base)).collect()

    val versions = graft.sinks.ManifestStore.versions(spark, base + "/manifest")
    assert(versions == Seq(1L, 2L), s"expected exactly v1+v2, got $versions")
    def fileSet(v: Long) = spark.read.json(s"$base/manifest/manifest_v$v")
      .select("file").collect().map(_.getString(0)).toSet
    val (v1, v2) = (fileSet(1), fileSet(2))

    // the scale property: erasure rewrote SOME files, not the table —
    // carried files appear in both versions under the SAME path
    val carried = v1 intersect v2
    val rewritten = v2 diff v1
    assert(carried.nonEmpty, "no file was carried by reference")
    assert(rewritten.nonEmpty, "no file was rewritten — the doomed range hit nothing")
    assert((v1 diff v2).nonEmpty, "no original file was retired")

    // the erased table: zero doomed rows, exact survivor count
    val cur = spark.read.parquet(v2.toSeq: _*)
    assert(cur.filter(col("o_custkey") >= lo && col("o_custkey") <= hi).count() == 0L)
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_custkey") < lo || col("o_custkey") > hi).count()
    assert(cur.count() == expected)
    assert(out.head.getLong(0) == expected && out.head.getBoolean(2))
  }

  test("sink_delete: a miss (range outside the table) rewrites nothing") {
    val base = Files.createTempDirectory("graft_erase_miss").toString
    val out = IOQueries.sinkDelete(spark, sfDir, 1000000L, 1000010L, Some(base)).collect()
    def fileSet(v: Long) = spark.read.json(s"$base/manifest/manifest_v$v")
      .select("file").collect().map(_.getString(0)).toSet
    assert(fileSet(1) == fileSet(2), "a no-op erase must carry every file unchanged")
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(out.head.getLong(0) == total)
    assert(!out.head.getBoolean(2)) // pruned=false: nothing was doomed
  }

  test("t_target_encode: encode stats join is a broadcast, no second fact shuffle") {
    val df = queries.Analytics.tTargetEncode(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"category stats should broadcast onto the fact scan:\n$plan")
    // LOO identity: category avg of (sum-x)/(n-1) == the plain category
    // mean — a closed-form invariant of the encode
    val enc = df.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val plain = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(round(avg("o_totalprice"), 2).as("m"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    enc.foreach { case (k, v) =>
      assert(math.abs(v - plain(k)) < 0.05,
        s"LOO avg for $k drifted from the category mean: $v vs ${plain(k)}")
    }
  }

  test("q_ab_test: welch statistic matches a driver-side replay") {
    val out = queries.Analytics.qAbTest(spark, sfDir).collect().head
    val rows = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("v"), col("value"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    def stats(v: Int) = {
      val xs = rows.filter(_._1 == v).map(_._2)
      val m = xs.sum / xs.length
      val va = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      (xs.length.toLong, m, va)
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(out.getLong(0) == na && out.getLong(1) == nb)
    assert(math.abs(out.getDouble(3) - t) < 1e-3,
      s"t_stat ${out.getDouble(3)} vs replay $t")
    assert(out.getBoolean(4) == (math.abs(t) > 1.96))
  }

  test("e_stream_cdc converges to the batch CDC merge's final state") {
    val streamed = Events.streamCdc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = IOQueries.sinkMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream/batch CDC divergence:\nstream=$streamed\nbatch=$batch")
  }
}
