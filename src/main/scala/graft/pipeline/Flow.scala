package graft.pipeline

import org.slf4j.LoggerFactory

/** Minimal task/flow orchestration (SURVEY.md §2 P1) — the Spark-side
  * analogue of the reference's Prefect usage: named tasks with retries
  * and logging, composed into named flows
  * (reference: week_2/data_ingest/pipeline.py:141 `@task(retries=3)`,
  * :203 `@flow(name="Ingest Flow")`, subflow at :222).
  *
  * Deliberately thin: Spark itself is the distributed execution engine;
  * what a pipeline layer adds is retry policy, structured logging, and
  * composition — not scheduling (that's the cluster manager's job).
  * Tasks are plain functions, so a Flow composes like code and the
  * whole flow remains one Spark application (lineage intact, no
  * per-task materialization unless a task chooses to write).
  */
object Flow {
  private val log = LoggerFactory.getLogger("graft.pipeline")

  final case class TaskConfig(retries: Int = 0, retryDelayMs: Long = 0L)

  /** Run `body` with the reference's retry semantics: up to
    * `retries` re-attempts, fixed delay, logs every attempt.
    */
  def task[A](name: String, config: TaskConfig = TaskConfig())(body: => A): A = {
    var attempt = 0
    var result: Option[A] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= config.retries) {
      attempt += 1
      try {
        log.info(s"task=$name attempt=$attempt starting")
        val a = body
        log.info(s"task=$name attempt=$attempt succeeded")
        result = Some(a)
      } catch {
        case e: Throwable =>
          lastErr = e
          log.warn(s"task=$name attempt=$attempt failed: ${e.getMessage}")
          if (attempt <= config.retries && config.retryDelayMs > 0)
            Thread.sleep(config.retryDelayMs)
      }
    }
    result.getOrElse(throw new RuntimeException(
      s"task $name failed after $attempt attempts", lastErr))
  }

  /** A flow is just a named, logged scope — subflows compose by calling
    * `flow` inside `flow`, mirroring the reference's subflow call.
    */
  def flow[A](name: String)(body: => A): A = {
    log.info(s"flow=$name starting")
    try {
      val a = body
      log.info(s"flow=$name succeeded")
      a
    } catch {
      case e: Throwable =>
        log.error(s"flow=$name failed: ${e.getMessage}")
        throw e
    }
  }
}
