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

  test("end-to-end flow produces the transformed aggregate") {
    val out = graft.queries.IOQueries.flowE2E(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("note").contains("artificial transformation")))
  }
}
