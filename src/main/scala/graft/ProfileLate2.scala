package graft

/** Throwaway: minimal MemoryStream late-drop semantics probe. */
object ProfileLate2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[java.sql.Timestamp]
    val q = mem.toDF().withColumnRenamed("value", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late2").outputMode("update")
      .start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData(t(10, 0), t(10, 5))   // watermark after: 10:05 - 10m = 09:55
    q.processAllAvailable()
    mem.addData(t(12, 0))             // watermark after: 11:50
    q.processAllAvailable()
    mem.addData(t(9, 0))              // 09:00 < 11:50 watermark → should drop
    q.processAllAvailable()
    q.stop()
    spark.table("late2").orderBy("window").show(false)
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"[dbg] batch=${p.batchId} in=${p.numInputRows} wm=${p.eventTime.get("watermark")} dropped=${so.map(_.numRowsDroppedByWatermark)}")
    }
    spark.stop()
  }
}
