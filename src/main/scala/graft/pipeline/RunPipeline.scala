package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftConf, GraftSession, Tables}
import graft.etl.{SilverCustomers, SilverOrders, SilverParts}
import graft.gold.{CustomerAnalytics, MlFeatures, SalesSummary}
import graft.incremental.WatermarkStore
import graft.quality.{DataQuality, QualityReport}
import graft.sources.Sinks

/** The end-to-end medallion pipeline: one invocation runs
  * bronze → silver (3 jobs) → gold (3 jobs) over a data directory with
  * partitioned parquet writes, single-pass quality gates with row-level
  * quarantine, per-table quality-report JSON, at-least-once watermark
  * commit, and the DAG runner's retry/breaker/DLQ control plane.
  *
  * This is the composition the reference ships as its top-level artifacts:
  * each silver job mirrors the glue template `main()` (read → clean →
  * validate → write partitioned parquet → write quality JSON → commit
  * bookmark — reference/terraform/modules/glue/templates/
  * bronze_to_silver_orders.py:380-422), and the job graph mirrors the
  * orchestrator's ready-job dependency loop
  * (reference/lambda/pipeline_orchestrator/lambda_function.py:360-497).
  *
  * Scale notes: every job body is one composed lazy plan ending in a
  * write — no driver-side row loops; the orders fact flows through a
  * watermark-filtered scan (predicate pushed to parquet), the quality
  * gate is a cached single pass deciding both destinations, silver facts
  * land hive-partitioned by order_year via DYNAMIC partition overwrite so
  * re-running a day's increment is idempotent (only touched partitions
  * rewrite — full-table overwrite is impossible at 100 TB), and the
  * watermark commits AFTER the write ([[graft.incremental.Incremental]]
  * at-least-once semantics: a crashed run re-reads, never skips).
  *
  * Output layout under `outRoot`:
  * {{{
  *   silver/{orders,customers,parts}/      partitioned parquet
  *   gold/{daily_sales,monthly_sales,customer_analytics,ml_features}/
  *   quality/<table>/                      1-file JSON report per table
  *   quarantine/<table>/                   gated-out rows + reason
  *   _state/                               watermarks + DLQ
  * }}}
  */
object RunPipeline {

  final case class Layout(root: String) {
    def silver(table: String): String = s"$root/silver/$table"
    def gold(table: String): String = s"$root/gold/$table"
    def quality(table: String): String = s"$root/quality/$table"
    def quarantine(table: String): String = s"$root/quarantine/$table"
    def stateDir: String = s"$root/_state"
    def dlqPath: String = s"$root/_state/dlq.jsonl"
  }

  /** Everything one invocation produced: the DAG report plus each silver
    * table's quality report and (clean, quarantined) row counts.
    */
  final case class PipelineResult(
      run: Pipeline.RunReport,
      quality: Map[String, QualityReport.Report],
      gateCounts: Map[String, (Long, Long)])

  /** One-pass quality gate + dual write (the S8 quarantine contract, kept
    * partitioned): rows passing `rowPredicate` land in `cleanPath` via
    * dynamic partition overwrite (idempotent re-runs), the rest land in
    * `quarantinePath` with a machine-readable reason. The tagged frame is
    * cached so the split costs ONE evaluation of the upstream plan, not
    * two.
    */
  private def gatedWrite(df: DataFrame, rowPredicate: org.apache.spark.sql.Column,
      partitionCols: Seq[String], cleanPath: String, quarantinePath: String,
      reason: String): (Long, Long) = {
    val tagged = df.withColumn("_pass", rowPredicate).cache()
    try {
      val clean = tagged.filter(col("_pass")).drop("_pass")
      val bad = tagged.filter(!col("_pass") || col("_pass").isNull).drop("_pass")
        .withColumn("quarantine_reason", lit(reason))
      if (partitionCols.isEmpty)
        clean.write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(cleanPath)
      else Sinks.parquetOverwritePartitions(clean, cleanPath, partitionCols)
      bad.write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(quarantinePath)
      (clean.count(), bad.count())
    } finally { tagged.unpersist(); () }
  }

  /** The quality report as a 1-row frame for the single-file JSON sink —
    * mirrors the glue template's `write_quality_metrics`
    * (bronze_to_silver_orders.py:360-378).
    */
  private def reportDf(spark: SparkSession, table: String,
      rep: QualityReport.Report, cleanRows: Long, quarantinedRows: Long): DataFrame = {
    import spark.implicits._
    Seq((table, rep.overallScore, rep.passed, rep.severity,
      rep.failedChecks.mkString(","), cleanRows, quarantinedRows))
      .toDF("table", "overall_score", "passed", "severity", "failed_checks",
        "clean_rows", "quarantined_rows")
  }

  /** Silver-orders parquet → the raw-ish fact columns the gold jobs
    * consume (the conformance select the reference's silver_to_gold
    * templates open with).
    */
  private def silverOrdersAsFacts(spark: SparkSession, lay: Layout): DataFrame =
    spark.read.parquet(lay.silver("orders"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("order_date").cast("string").as("o_orderdate"),
        col("o_totalprice_dec").cast("double").as("o_totalprice"))

  /** Build and run the whole DAG. Idempotent: a second invocation over the
    * same `outRoot` sees the committed watermark, reads an empty increment
    * and leaves silver/gold intact.
    */
  def run(spark: SparkSession, bronzeDir: String, outRoot: String,
      conf: GraftConf = GraftConf.default,
      notifier: QualityReport.Notifier = QualityReport.Notifier.logging,
      policy: Pipeline.RetryPolicy = Pipeline.RetryPolicy()): PipelineResult = {
    val lay = Layout(outRoot)
    val bronze = Tables(spark, bronzeDir)
    val store = new WatermarkStore(lay.stateDir)
    val dlq = new Pipeline.DeadLetterQueue(lay.dlqPath)

    val quality = scala.collection.concurrent.TrieMap.empty[String, QualityReport.Report]
    val gates = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

    /** Shared silver-job shape: clean → quality(+alerts) → gated dual
      * write → quality JSON. Returns nothing; results land in the maps.
      */
    def silverJob(table: String, cleaned: DataFrame, cfg: QualityReport.Config,
        gate: org.apache.spark.sql.Column, partitionCols: Seq[String]): Unit = {
      val rep = QualityReport.runWithAlerts(cleaned, cfg, table, notifier, conf)
      val (ok, bad) = gatedWrite(cleaned, gate, partitionCols,
        lay.silver(table), lay.quarantine(table),
        if (rep.passed) s"row_gate:$table" else rep.failedChecks.mkString(","))
      Sinks.jsonSingleFile(reportDf(spark, table, rep, ok, bad), lay.quality(table))
      quality(table) = rep
      gates(table) = (ok, bad)
    }

    val jobs = Seq(
      Pipeline.Job("bronze_to_silver_orders")(() => {
        // Incremental: only rows past the committed high-water mark (the
        // predicate pushes into the parquet scan); first run = full load.
        val incr = store.get("orders", "o_orderdate") match {
          case Some(mark) => bronze.orders.filter(col("o_orderdate") > mark)
          case None       => bronze.orders
        }
        if (incr.isEmpty) {
          quality.putIfAbsent("orders",
            QualityReport.Report(Seq.empty, 100.0, passed = true, severity = "none"))
          gates.putIfAbsent("orders", (0L, 0L))
        } else {
          silverJob("orders", SilverOrders.silver(incr, conf),
            QualityReport.Config(
              nullColumns = Seq("o_orderkey", "o_custkey", "order_date"),
              dupKeys = Seq("o_orderkey"),
              rangeRules = Seq(DataQuality.RangeRule("o_totalprice_dec",
                min = Some(0.0)))),
            gate = col("is_complete_order") && col("data_quality_score") >= 0.8,
            partitionCols = Seq("order_year"))
          // At-least-once: the mark commits only now, after both writes —
          // a crash above re-reads this increment on the next run.
          val mark = incr.agg(max(col("o_orderdate")).cast("string")).head.getString(0)
          Option(mark).foreach(store.put("orders", "o_orderdate", _))
        }
      }),
      Pipeline.Job("bronze_to_silver_customers")(() =>
        silverJob("customers", SilverCustomers.clean(bronze.customer),
          QualityReport.Config(
            nullColumns = Seq("c_custkey", "name_normalized"),
            dupKeys = Seq("c_custkey")),
          gate = col("data_quality_score") >= 0.75,
          partitionCols = Seq.empty)),
      Pipeline.Job("bronze_to_silver_parts")(() =>
        silverJob("parts", SilverParts.clean(bronze.part),
          QualityReport.Config(
            nullColumns = Seq("p_partkey", "name_clean"),
            dupKeys = Seq("p_partkey"),
            rangeRules = Seq(DataQuality.RangeRule("margin_percentage",
              min = Some(0.0), max = Some(100.0)))),
          gate = col("data_quality_score") >= 0.8,
          partitionCols = Seq.empty)),
      Pipeline.Job("silver_to_gold_sales_summary",
          dependsOn = Seq("bronze_to_silver_orders"))(() => {
        val facts = silverOrdersAsFacts(spark, lay)
        Sinks.parquetPartitioned(
          SalesSummary.daily(facts).withColumn("order_year", year(col("order_date"))),
          lay.gold("daily_sales"), Seq("order_year"))
        Sinks.parquetPartitioned(SalesSummary.monthly(facts),
          lay.gold("monthly_sales"), Seq("order_year"))
      }),
      Pipeline.Job("silver_to_gold_customer_analytics",
          dependsOn = Seq("bronze_to_silver_orders", "bronze_to_silver_customers"))(() => {
        val dim = spark.read.parquet(lay.silver("customers"))
          .select(col("c_custkey"), col("c_name"),
            col("segment_standardized").as("c_mktsegment"), col("c_acctbal"))
        val out = CustomerAnalytics.withRfm(
          CustomerAnalytics.analytics(dim, silverOrdersAsFacts(spark, lay), conf))
        out.write.mode(SaveMode.Overwrite).option("compression", "snappy")
          .parquet(lay.gold("customer_analytics"))
      }),
      Pipeline.Job("silver_to_gold_ml_features",
          dependsOn = Seq("bronze_to_silver_orders"))(() => {
        val out = MlFeatures.keyedSplit(
          MlFeatures.withTargets(
            MlFeatures.features(silverOrdersAsFacts(spark, lay), conf)),
          "o_custkey")
        out.write.mode(SaveMode.Overwrite).option("compression", "snappy")
          .parquet(lay.gold("ml_features"))
      })
    )

    PipelineResult(Pipeline.run(jobs, policy, Some(dlq)),
      quality.toMap, gates.toMap)
  }

  /** CLI: `runMain graft.pipeline.RunPipeline <bronzeDir> <outRoot>` —
    * prints one JSON summary line.
    */
  def main(args: Array[String]): Unit = {
    val bronzeDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    try {
      val r = run(spark, bronzeDir, outRoot)
      val jobsJson = r.run.statuses.toSeq.sortBy(_._1).map {
        case (n, Pipeline.Succeeded)        => s""""$n":"succeeded""""
        case (n, Pipeline.SkippedDeps)      => s""""$n":"skipped""""
        case (n, f: Pipeline.FailedJob)     => s""""$n":"failed(${f.attempts})""""
      }.mkString("{", ",", "}")
      val gatesJson = r.gateCounts.toSeq.sortBy(_._1).map {
        case (t, (ok, bad)) => s""""$t":{"clean":$ok,"quarantined":$bad}"""
      }.mkString("{", ",", "}")
      println(s"""{"pipeline":"medallion","out":"$outRoot","jobs":$jobsJson,"gates":$gatesJson,"failed":${r.run.failed.size}}""")
    } finally spark.stop()
  }
}
