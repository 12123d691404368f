package graft.pipeline

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** In-process pipeline DAG runner with the reference's control-plane
  * semantics: dependency-ordered execution, bounded retries with
  * exponential backoff, and a per-job circuit breaker.
  *
  * Mirrors reference/lambda/pipeline_orchestrator/lambda_function.py:283-497
  * (ready-job selection = all dependencies completed) and
  * reference/lambda/snowflake_extractor/error_handler.py:267-470 (retry
  * strategy: max 3 attempts, exp backoff base 1s cap 60s; circuit breaker:
  * open after 5 failures, half-open after recovery timeout).
  *
  * The runner is driver-side control flow ONLY — each job body is expected
  * to launch distributed Spark work; nothing here touches data.
  */
object Pipeline {

  final case class Job(name: String, dependsOn: Seq[String] = Seq.empty)(
      val body: () => Unit) {
    def run(): Unit = body()
  }

  final case class RetryPolicy(
      maxAttempts: Int = 3,
      baseDelayMs: Long = 1000,
      maxDelayMs: Long = 60000,
      // test hook: sleeping is injectable so specs don't wait wall-clock
      sleep: Long => Unit = Thread.sleep)

  sealed trait JobStatus
  case object Succeeded extends JobStatus
  final case class FailedJob(attempts: Int, error: Throwable) extends JobStatus
  case object SkippedDeps extends JobStatus

  final case class RunReport(statuses: Map[String, JobStatus]) {
    def succeeded: Set[String] = statuses.collect { case (n, Succeeded) => n }.toSet
    def failed: Set[String] = statuses.collect { case (n, _: FailedJob) => n }.toSet
    def skipped: Set[String] = statuses.collect { case (n, SkippedDeps) => n }.toSet
  }

  /** Circuit breaker: open after `failureThreshold` consecutive failures,
    * half-open (one trial allowed) after `recoveryMs`.
    */
  final class CircuitBreaker(failureThreshold: Int = 5, recoveryMs: Long = 60000,
      now: () => Long = () => System.currentTimeMillis()) {
    private var failures = 0
    private var openedAt: Option[Long] = None

    def allow(): Boolean = openedAt match {
      case None    => true
      case Some(t) => now() - t >= recoveryMs // half-open trial
    }
    def onSuccess(): Unit = { failures = 0; openedAt = None }
    def onFailure(): Unit = {
      failures += 1
      if (failures >= failureThreshold) openedAt = Some(now())
    }
    def isOpen: Boolean = !allow()
  }

  def runWithRetry[T](policy: RetryPolicy)(body: () => T): Try[T] = {
    var attempt = 0
    var last: Try[T] = Failure(new IllegalStateException("no attempts"))
    while (attempt < policy.maxAttempts && last.isFailure) {
      last = Try(body())
      attempt += 1
      if (last.isFailure && attempt < policy.maxAttempts) {
        val delay = math.min(policy.baseDelayMs * (1L << (attempt - 1)), policy.maxDelayMs)
        policy.sleep(delay)
      }
    }
    last
  }

  /** Run the DAG: repeatedly pick jobs whose dependencies all succeeded
    * (`get_ready_jobs` semantics); jobs whose dependencies failed are
    * skipped, not run. Throws on cycles/unknown deps.
    */
  def run(jobs: Seq[Job], policy: RetryPolicy = RetryPolicy()): RunReport = {
    val byName = jobs.map(j => j.name -> j).toMap
    require(byName.size == jobs.size, "duplicate job names")
    jobs.foreach(j => j.dependsOn.foreach(d =>
      require(byName.contains(d), s"unknown dependency: ${j.name} -> $d")))

    val status = mutable.Map.empty[String, JobStatus]
    var progressed = true
    while (status.size < jobs.size && progressed) {
      progressed = false
      val ready = jobs.filter(j => !status.contains(j.name) &&
        j.dependsOn.forall(d => status.get(d).contains(Succeeded)))
      val doomed = jobs.filter(j => !status.contains(j.name) &&
        j.dependsOn.exists(d => status.get(d).exists(s => s != Succeeded)))
      for (j <- doomed) { status(j.name) = SkippedDeps; progressed = true }
      for (j <- ready) {
        progressed = true
        var attempts = 0
        val result = runWithRetry(policy) { () => attempts += 1; j.run() }
        status(j.name) = result match {
          case Success(_) => Succeeded
          case Failure(e) => FailedJob(attempts, e)
        }
      }
    }
    if (status.size < jobs.size)
      throw new IllegalArgumentException(
        s"dependency cycle among: ${jobs.map(_.name).filterNot(status.contains).mkString(", ")}")
    RunReport(status.toMap)
  }
}
