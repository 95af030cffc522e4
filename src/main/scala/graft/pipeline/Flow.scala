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

  /** Input-hash task memoization with TTL — the reference's
    * `cache_key_fn=task_input_hash, cache_expiration=timedelta(days=1)`
    * surface (reference: week_2/data_ingest/parametrized.py:80,144).
    *
    * Key = task name + MD5 of the inputs' string forms (the analogue of
    * Prefect's task_input_hash); a fresh entry short-circuits the body,
    * an expired one re-runs it. The store is JVM-scoped — one Spark
    * application = one driver JVM, so a backfill loop re-invoking the
    * same task+inputs (the reference's exact use case) hits the cache.
    * Cached DataFrames are lazy plans: memoization dedups plan
    * CONSTRUCTION (and any eager side effects in the body, e.g. a
    * staging write); Spark itself dedups execution via the usual
    * cache/ReusedExchange machinery. For cross-application durability,
    * persist the task result through TableStore and cache the path.
    */
  final case class CacheConfig(ttlMs: Long)

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, (Long, Any)]
  // injectable clock so specs can age entries without sleeping
  @volatile private[graft] var clock: () => Long = () => System.currentTimeMillis()
  private[graft] def resetClock(): Unit = clock = () => System.currentTimeMillis()

  /** Prefect's `task_input_hash` analogue: order-sensitive MD5 over the
    * inputs' string forms.
    */
  def inputHash(inputs: Seq[Any]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    inputs.foreach { in =>
      md.update(String.valueOf(in).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte) // separator: hash(("ab"),("c")) != hash(("a"),("bc"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** [[task]] with result caching: same name + same inputs within the
    * TTL returns the memoized result without running `body`.
    */
  def cachedTask[A](name: String, inputs: Seq[Any], cache: CacheConfig,
                    config: TaskConfig = TaskConfig())(body: => A): A = {
    val key = s"$name:${inputHash(inputs)}"
    val now = clock()
    val hit = memo.get(key)
    if (hit != null && hit._1 > now) {
      log.info(s"task=$name cache hit (key=$key)")
      hit._2.asInstanceOf[A]
    } else {
      val a = task(name, config)(body)
      memo.put(key, (now + cache.ttlMs, a))
      a
    }
  }

  def clearCache(): Unit = memo.clear()

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
