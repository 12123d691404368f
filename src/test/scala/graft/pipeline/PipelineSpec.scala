package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import Pipeline._

class PipelineSpec extends AnyFunSuite {

  private val fastRetry = RetryPolicy(maxAttempts = 3, baseDelayMs = 1, sleep = _ => ())

  test("DAG runs in dependency order") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val report = Pipeline.run(Seq(
      Job("gold", Seq("silver"))(() => order += "gold"),
      Job("bronze")(() => order += "bronze"),
      Job("silver", Seq("bronze"))(() => order += "silver")), fastRetry)
    assert(order.toSeq === Seq("bronze", "silver", "gold"))
    assert(report.succeeded === Set("bronze", "silver", "gold"))
  }

  test("failed dependency skips downstream jobs, independent jobs still run") {
    val ran = scala.collection.mutable.Set.empty[String]
    val report = Pipeline.run(Seq(
      Job("extract")(() => throw new RuntimeException("boom")),
      Job("clean", Seq("extract"))(() => ran += "clean"),
      Job("unrelated")(() => ran += "unrelated")), fastRetry)
    assert(report.failed === Set("extract"))
    assert(report.skipped === Set("clean"))
    assert(ran.toSet === Set("unrelated"))
  }

  test("retry retries with backoff until success within maxAttempts") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val policy = RetryPolicy(maxAttempts = 3, baseDelayMs = 100, sleep = delays += _)
    val res = runWithRetry(policy) { () =>
      calls += 1; if (calls < 3) throw new RuntimeException("flaky"); "ok"
    }
    assert(res.isSuccess && calls === 3)
    assert(delays.toSeq === Seq(100L, 200L)) // exponential
  }

  test("retry gives up after maxAttempts and reports attempt count") {
    val report = Pipeline.run(Seq(Job("always_fails")(() => throw new RuntimeException("x"))), fastRetry)
    report.statuses("always_fails") match {
      case FailedJob(attempts, _) => assert(attempts === 3)
      case other                  => fail(s"unexpected: $other")
    }
  }

  test("circuit breaker opens after threshold and half-opens after recovery") {
    var now = 0L
    val cb = new CircuitBreaker(failureThreshold = 3, recoveryMs = 1000, now = () => now)
    assert(cb.allow())
    (1 to 3).foreach(_ => cb.onFailure())
    assert(cb.isOpen)
    now = 500
    assert(!cb.allow())
    now = 1001
    assert(cb.allow()) // half-open trial
    cb.onSuccess()
    assert(!cb.isOpen && cb.allow())
  }

  test("cycles are rejected") {
    intercept[IllegalArgumentException] {
      Pipeline.run(Seq(Job("a", Seq("b"))(() => ()), Job("b", Seq("a"))(() => ())), fastRetry)
    }
  }
}
