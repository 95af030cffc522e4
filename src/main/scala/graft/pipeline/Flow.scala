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

  /** Run independent tasks CONCURRENTLY on the shared SparkSession —
    * the reference's concurrent task runner, Spark-style: each branch
    * submits its own jobs from its own thread and the scheduler
    * interleaves their stages across executor slots (one application:
    * shared cache, broadcast state, and shuffle files; FAIR scheduler
    * pools would add per-branch quotas on top). Worth it exactly when
    * branches are individually too small to saturate the cluster — N
    * half-idle jobs back-to-back become N interleaved jobs at full
    * utilization. Each branch keeps [[task]]'s retry/log semantics;
    * results return in DECLARATION order regardless of completion
    * order, so downstream composition stays deterministic.
    *
    * The pool is capped at `maxConcurrency` (a thread per branch is
    * unbounded for a wide backfill — excess branches queue), the whole
    * call is bounded by `timeoutMs` (a hung branch must not hang the
    * caller forever), and the first failure — observed in COMPLETION
    * order via an ExecutorCompletionService, so it is seen even while
    * a slower sibling still runs — cancels the remaining branches
    * (interrupt + shutdownNow) instead of letting them burn cluster
    * time behind a doomed flow.
    */
  def parallel[A](tasks: Seq[(String, () => A)],
                  maxConcurrency: Int = 16,
                  timeoutMs: Long = 24L * 60 * 60 * 1000): Seq[A] = {
    import java.util.concurrent.{Callable, ExecutorCompletionService, Executors, TimeUnit, TimeoutException}
    if (tasks.isEmpty) return Seq.empty
    val pool = Executors.newFixedThreadPool(
      math.max(1, math.min(tasks.size, maxConcurrency)))
    try {
      // completions are consumed in COMPLETION order (a failure behind
      // a slow sibling is observed the moment it happens, not after the
      // sibling finishes); results are indexed back into declaration
      // order for the caller
      val ecs = new ExecutorCompletionService[(Int, A)](pool)
      val futures = tasks.zipWithIndex.map { case ((name, body), i) =>
        ecs.submit(new Callable[(Int, A)] {
          override def call(): (Int, A) = (i, task(name)(body()))
        })
      }
      val deadline = System.currentTimeMillis() + timeoutMs
      val results = new Array[Any](tasks.size)
      try {
        var done = 0
        while (done < tasks.size) {
          val f = ecs.poll(
            math.max(1L, deadline - System.currentTimeMillis()), TimeUnit.MILLISECONDS)
          if (f == null)
            throw new TimeoutException(
              s"Flow.parallel: ${tasks.size - done}/${tasks.size} branches still running after ${timeoutMs}ms")
          val (i, a) = f.get()
          results(i) = a
          done += 1
        }
        results.toSeq.map(_.asInstanceOf[A])
      } catch {
        case e: Throwable =>
          futures.foreach(_.cancel(true))
          throw (e match {
            case ee: java.util.concurrent.ExecutionException
              if ee.getCause != null => ee.getCause
            case other => other
          })
      }
    } finally pool.shutdownNow()
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
    * inputs' string forms. Each input is length-prefixed (4-byte
    * big-endian) before its bytes — a sentinel separator would make
    * Seq("a<NUL>","b") and Seq("a","<NUL>b") collide; a length prefix
    * makes the encoding injective for any byte content.
    */
  def inputHash(inputs: Seq[Any]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    inputs.foreach { in =>
      val bytes = String.valueOf(in).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
      md.update(bytes)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  // Bound on distinct (name, inputs) entries: a long-lived driver
  // running a wide backfill must not grow the memo without limit. When
  // exceeded, expired entries are swept; if everything is still live the
  // map may transiently exceed the bound (correctness over strictness).
  private val MaxMemoEntries = 4096

  /** [[task]] with result caching: same name + same inputs within the
    * TTL returns the memoized result without running `body`.
    *
    * The lookup-or-run is a single `compute` on the memo map, so two
    * concurrent identical calls run the body once and share the result
    * (Prefect's refresh semantics); an expired entry is replaced in the
    * same atomic step, which also evicts it.
    */
  def cachedTask[A](name: String, inputs: Seq[Any], cache: CacheConfig,
                    config: TaskConfig = TaskConfig())(body: => A): A = {
    val key = s"$name:${inputHash(inputs)}"
    val now = clock()
    var ran = false
    // compute leaves the mapping unchanged if the body throws
    val entry = memo.compute(key, (_, cur) =>
      if (cur != null && cur._1 > now) cur
      else { ran = true; (now + cache.ttlMs, task(name, config)(body)) })
    if (!ran) log.info(s"task=$name cache hit (key=$key)")
    if (memo.size > MaxMemoEntries) {
      val it = memo.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue._1 <= now) it.remove()
    }
    entry._2.asInstanceOf[A]
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
