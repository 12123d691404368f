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

  test("exhausted-retry failure lands in the DLQ with name, attempts and error payload") {
    val dlqPath = java.nio.file.Files.createTempDirectory("dlq").resolve("dlq.jsonl").toString
    val dlq = new DeadLetterQueue(dlqPath, now = () => 1700000000000L)
    val report = Pipeline.run(Seq(
      Job("extract")(() => throw new IllegalStateException("upstream gone")),
      Job("ok_job")(() => ())), fastRetry, dlq = Some(dlq))
    assert(report.failed === Set("extract"))
    val entries = dlq.entries()
    assert(entries.size === 1) // only the failure — succeeded jobs never recorded
    assert(entries.head.contains("\"job_name\":\"extract\""))
    assert(entries.head.contains("\"attempts\":3"))
    assert(entries.head.contains("IllegalStateException"))
    assert(entries.head.contains("upstream gone"))
    // readable back as a table for triage
    val df = dlq.asDataFrame(graft.SparkSpec.session)
    assert(df.count() === 1)
    assert(df.select("job_name").head().getString(0) === "extract")
    assert(df.select("attempts").head().getLong(0) === 3L)
  }

  test("DLQ appends across runs and escapes control characters in errors") {
    val dlqPath = java.nio.file.Files.createTempDirectory("dlq2").resolve("dlq.jsonl").toString
    val dlq = new DeadLetterQueue(dlqPath, now = () => 0L)
    dlq.record("j1", 3, new RuntimeException("line1\nline2\t\"quoted\""))
    dlq.record("j2", 1, new RuntimeException(null: String))
    assert(dlq.entries().size === 2)
    val df = dlq.asDataFrame(graft.SparkSpec.session)
    assert(df.filter(df("job_name") === "j1").select("error_message").head().getString(0)
      === "line1\nline2\t\"quoted\"")
  }

  test("cycles are rejected") {
    intercept[IllegalArgumentException] {
      Pipeline.run(Seq(Job("a", Seq("b"))(() => ()), Job("b", Seq("a"))(() => ())), fastRetry)
    }
  }
}
