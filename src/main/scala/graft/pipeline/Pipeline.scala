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

  /** Dead-letter queue for exhausted-retry failures — the persistent record
    * the reference keeps when an extraction burns all attempts
    * (reference/lambda/snowflake_extractor/error_handler.py:267-470: job
    * name, attempt count, error payload routed to the DLQ). Append-only
    * JSONL so an overnight orchestrated run never loses failure payloads;
    * `asDataFrame` reads it back as a table for triage queries.
    */
  final class DeadLetterQueue(path: String,
      now: () => Long = () => System.currentTimeMillis()) {
    private val p = java.nio.file.Paths.get(path)

    private def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    def record(jobName: String, attempts: Int, error: Throwable): Unit = {
      val line =
        s"""{"job_name":"${esc(jobName)}","attempts":$attempts,""" +
        s""""error_class":"${esc(error.getClass.getName)}",""" +
        s""""error_message":"${esc(Option(error.getMessage).getOrElse(""))}",""" +
        s""""failed_at_ms":${now()}}"""
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

    def entries(): Seq[String] =
      if (java.nio.file.Files.exists(p))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala.toSeq
      else Seq.empty

    def asDataFrame(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      spark.read.json(spark.createDataset(entries()))
    }
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
    * skipped, not run. Throws on cycles/unknown deps. When a `dlq` is
    * given, every exhausted-retry failure is persisted there (name,
    * attempts, error payload) before the run continues.
    */
  def run(jobs: Seq[Job], policy: RetryPolicy = RetryPolicy(),
      dlq: Option[DeadLetterQueue] = None): RunReport = {
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
          case Failure(e) =>
            dlq.foreach(_.record(j.name, attempts, e))
            FailedJob(attempts, e)
        }
      }
    }
    if (status.size < jobs.size)
      throw new IllegalArgumentException(
        s"dependency cycle among: ${jobs.map(_.name).filterNot(status.contains).mkString(", ")}")
    RunReport(status.toMap)
  }
}
