package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Load sentinel for the bench harness (VERDICT r11 #3).
  *
  * Three rounds of committed artifacts needed box-load adjudication
  * AFTER the fact: r11's quiet run inflated 1.31× uniformly across
  * entries the round never touched, and the reader had to infer
  * "box, not code" from the inflation's uniformity. This channel
  * makes the artifact self-reporting instead: a fixed-cost probe runs
  * BETWEEN bench entries, and `/proc/loadavg` (1-minute field) is
  * sampled beside it. The probe is pure codegen'd CPU —
  * `range → xxhash64 → sum`, no IO, no shuffle, no cache interaction,
  * partitioned to the session's parallelism — so its wall time moves
  * only with scheduler contention. A flat probe channel certifies the
  * timings beside it; an inflated segment marks exactly which entries
  * ran under load and should be discounted.
  *
  * The first probe in a JVM warms the probe's own codegen and is
  * dropped from the channel (it would read as a fake load spike).
  * Recording is synchronized; the bench harnesses are single-threaded
  * but the buffer must not corrupt if a future harness isn't.
  */
object BenchSentinel {
  /** 2^29 hashes ≈ 0.1–0.3 s at local[32] on this box: cheap enough
    * to interleave ~250 times per full bench (< 1 min added), long
    * enough that a contended scheduler shows up as a multiple, not
    * jitter.
    */
  private val probeRows = 1L << 29

  private case class Sample(after: String, probeSec: Double, load1: Double)
  private val buf = ArrayBuffer.empty[Sample]
  private var warmed = false

  /** 1-minute load average; -1 where /proc is absent. */
  def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble
      finally src.close()
    } catch { case _: Exception => -1.0 }

  /** One timed probe run (no recording). `bit_xor`, not `sum`: the sum
    * of 2^29 hashes overflows ANSI-mode Long arithmetic, and `count`
    * would let the optimizer prune the hash away entirely.
    */
  def probeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, probeRows, 1L, spark.sparkContext.defaultParallelism)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)")).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** Probe + loadavg, recorded against the entry that just finished. */
  def record(spark: SparkSession, after: String): Unit = synchronized {
    if (!warmed) { probeOnce(spark); warmed = true }
    buf += Sample(after, probeOnce(spark), loadavg1())
  }

  private def stats: Option[(Double, Double, Double, Double)] = {
    if (buf.isEmpty) None
    else {
      val ts = buf.map(_.probeSec).sorted
      val med = ts(ts.length / 2)
      Some((med, ts.last, ts.last / math.max(med, 1e-9),
        buf.map(_.load1).max))
    }
  }

  /** Full calibration object (for the verbose artifact): per-entry
    * `[probe_sec, loadavg1]` plus median/max/flatness rollups. Empty
    * string when nothing was recorded. Leading comma so callers splice
    * it into a JSON object tail like the other optional blocks.
    */
  def json: String = synchronized {
    stats.fold("") { case (med, mx, flat, loadMax) =>
      val per = buf.map { s =>
        "\"" + s.after + "\":[" + f"${s.probeSec}%.3f,${s.load1}%.2f]"
      }.mkString("{", ",", "}")
      f""","calibration":{"probe_med":$med%.3f,"probe_max":$mx%.3f,"flatness":$flat%.2f,"load_max":$loadMax%.2f,"per_entry":$per}"""
    }
  }

  /** Rollups only (for the tail-truncation-proof compact line). */
  def compactJson: String = synchronized {
    stats.fold("") { case (med, mx, flat, loadMax) =>
      f""","calib":{"probe_med":$med%.3f,"probe_max":$mx%.3f,"flatness":$flat%.2f,"load_max":$loadMax%.2f}"""
    }
  }
}
