package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("streaming windowed agg equals the batch window agg (parity)") {
    val batch = Events.windowAgg(spark, sfDir).collect()
    val stream = Events.streamParity(spark, sfDir).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("stream dedup of a double-delivered input equals single-delivery totals") {
    val deduped = Events.streamDedup(spark, sfDir).collect()
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type").collect()
    assert(deduped.toSeq == batch.toSeq)
  }

  test("sessions respect the gap: no intra-session gap exceeds 30 min") {
    val gapUs = 30L * 60 * 1000000L
    val sessions = Events.sessionize(spark, sfDir).collect()
    assert(sessions.nonEmpty)
    sessions.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val dur = r.getAs[Long]("duration_us")
      assert(n >= 1)
      assert(dur >= 0)
      // a session of n events spans at most (n-1) * gap
      assert(dur <= (n - 1) * gapUs, s"session too long for its event count: $r")
    }
  }

  test("session count matches a driver-side replay") {
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gapUs = 30L * 60 * 1000000L
    val expected = rows.groupBy(_._1).map { case (_, es) =>
      val ts = es.map(_._2).sorted
      1 + ts.sliding(2).count(w => w.length == 2 && w(1) - w(0) > gapUs)
    }.sum
    val got = Events.sessionize(spark, sfDir).count()
    assert(got == expected)
  }
}
