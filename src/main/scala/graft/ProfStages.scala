package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage/per-job breakdown of a single bench-semantics query run:
  * which stages carry the wall clock, how many jobs the query fires,
  * and how much of each stage is task time vs dispatch gap — the
  * instrument for the round-14 fixed-cost thesis (guide §1: measure
  * where the time goes before touching the operator).
  *
  * `runMain graft.ProfStages <query> <sfDir> [warmRuns=1]`
  */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warm = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, submitted: Long, completed: Long,
                  taskTimeMs: Long, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var listening = false
    val listener = new SparkListener {
      private val subm = mutable.Map.empty[Int, Long]
      private val jobStart = mutable.Map.empty[Int, Long]
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (listening) subm(e.stageInfo.stageId) = System.currentTimeMillis()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (listening) {
          val si = e.stageInfo
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            subm.getOrElse(si.stageId, 0L), System.currentTimeMillis(),
            si.taskMetrics.executorRunTime, si.numTasks)
        }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (listening) jobStart(e.jobId) = System.currentTimeMillis()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (listening) jobs += ((e.jobId,
          jobStart.getOrElse(e.jobId, 0L), System.currentTimeMillis()))
    }
    spark.sparkContext.addSparkListener(listener)

    def run(): Double = {
      graft.operators.Graph.dropSharedCache(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // cold
    (1 until warm).foreach(_ => run())
    spark.catalog.clearCache(); System.gc()
    stages.clear(); jobs.clear()
    listening = true
    val t = run()
    listening = false
    // drain the async listener bus before reading the buffers
    Thread.sleep(500)
    println(f"TOTAL $q $t%.3f s  jobs=${jobs.size}  stages=${stages.size}")
    val t0 = (jobs.map(_._2) ++ stages.map(_.submitted)).min
    println("-- jobs (start..end ms rel) --")
    jobs.sortBy(_._2).foreach { case (id, s, e) =>
      println(f"job $id%4d  ${s - t0}%6d..${e - t0}%6d  (${e - s}%5d ms)")
    }
    println("-- stages by wall (submit..complete) --")
    stages.sortBy(-_.taskTimeMs).take(30).foreach { s =>
      println(f"stage ${s.id}%4d wall=${s.completed - s.submitted}%5d ms task=${s.taskTimeMs}%6d ms tasks=${s.tasks}%3d  ${s.name}")
    }
    val wall = jobs.map { case (_, s, e) => e - s }.sum
    println(f"sum(job walls)=$wall ms  over ${jobs.size} jobs  (t=${t * 1000}%.0f ms; gap=${t * 1000 - wall}%.0f ms outside jobs)")
    spark.stop()
  }
}
