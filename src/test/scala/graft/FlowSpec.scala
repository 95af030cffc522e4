package graft

import graft.pipeline.Flow
import java.util.concurrent.atomic.AtomicInteger

class FlowSpec extends SparkSpec {

  test("task retries until success") {
    val attempts = new AtomicInteger(0)
    val result = Flow.task("flaky", Flow.TaskConfig(retries = 3)) {
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      "ok"
    }
    assert(result == "ok")
    assert(attempts.get() == 3)
  }

  test("task fails after exhausting retries") {
    val attempts = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Flow.task("doomed", Flow.TaskConfig(retries = 2)) {
        attempts.incrementAndGet(); sys.error("permanent")
      }
    }
    assert(attempts.get() == 3)
    assert(e.getMessage.contains("doomed"))
  }

  test("flow propagates failures") {
    intercept[RuntimeException] {
      Flow.flow("bad") { sys.error("boom") }
    }
  }

  test("cached task: identical inputs within TTL skip the body") {
    Flow.clearCache()
    val runs = new AtomicInteger(0)
    def call(x: Int): Int =
      Flow.cachedTask("memo", Seq(x), Flow.CacheConfig(ttlMs = 60000)) {
        runs.incrementAndGet(); x * 2
      }
    assert(call(21) == 42)
    assert(call(21) == 42)
    assert(runs.get() == 1, "second identical call must hit the cache")
    assert(call(7) == 14)
    assert(runs.get() == 2, "different inputs must run the body")
  }

  test("cached task: expired TTL re-runs the body") {
    Flow.clearCache()
    var now = 1000L
    Flow.clock = () => now
    try {
      val runs = new AtomicInteger(0)
      def call(): Int =
        Flow.cachedTask("ttl", Seq("same"), Flow.CacheConfig(ttlMs = 500)) {
          runs.incrementAndGet()
        }
      call()
      now += 100
      call()
      assert(runs.get() == 1, "fresh entry must be served from cache")
      now += 1000
      call()
      assert(runs.get() == 2, "expired entry must re-run")
    } finally Flow.resetClock()
  }

  test("input hash separates adjacent inputs unambiguously") {
    assert(Flow.inputHash(Seq("ab", "c")) != Flow.inputHash(Seq("a", "bc")))
    assert(Flow.inputHash(Seq(1, 2)) == Flow.inputHash(Seq(1, 2)))
  }

  test("end-to-end flow produces the transformed aggregate") {
    val out = graft.queries.IOQueries.flowE2E(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("note").contains("artificial transformation")))
  }

  test("parallel returns declaration order regardless of completion order") {
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val out = graft.pipeline.Flow.parallel(Seq(
      ("slow", () => { Thread.sleep(300); done.add("slow"); "a" }),
      ("fast", () => { done.add("fast"); "b" })))
    assert(out === Seq("a", "b"))
    // the fast branch really finished first — they ran concurrently
    assert(done.peek() === "fast")
  }

  test("parallel keeps per-task retry semantics") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = graft.pipeline.Flow.parallel(Seq(
      ("flaky", () => {
        graft.pipeline.Flow.task("inner", graft.pipeline.Flow.TaskConfig(retries = 2)) {
          if (attempts.incrementAndGet() < 3) sys.error("boom") else 42
        }
      })))
    assert(out === Seq(42))
    assert(attempts.get() === 3)
  }
}
