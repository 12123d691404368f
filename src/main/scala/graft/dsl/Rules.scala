package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative rule / aggregation / feature DSL.
  *
  * The reference drives quality rules, aggregation specs and feature
  * definitions from config strings (reference/terraform/modules/glue/variables.tf:262-511)
  * evaluated with `df.filter(expression)` per rule
  * (bronze_to_silver_orders.py:244-252). Here the same SQL predicate strings
  * compile via `expr(...)` into Catalyst expressions — including RLIKE (F6),
  * IS NOT NULL, BETWEEN, IN — and the engine evaluates ALL rules in a single
  * aggregate pass instead of one full scan per rule (SURVEY.md §4
  * "Engine-level fix"): at 100 TB, N rules must not mean N scans.
  */
final case class QualityRule(name: String, expression: String, threshold: Double = 1.0) {
  def predicate: Column = expr(expression)
}

final case class RuleResult(
    rule: String,
    passed: Long,
    total: Long,
    passRate: Double,
    thresholdMet: Boolean
)

object RuleEngine {

  /** Evaluate every rule in ONE aggregation job: sum(when(pred,1)) per rule
    * plus a count, all over a single scan (A10 done distributed).
    */
  def evaluate(df: DataFrame, rules: Seq[QualityRule]): Seq[RuleResult] = {
    require(rules.nonEmpty, "no rules")
    val aggs = count(lit(1)).as("_total") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.predicate, 1L).otherwise(0L)).as(s"_r$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    rules.zipWithIndex.map { case (r, i) =>
      val passed = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val rate = if (total == 0) 1.0 else passed.toDouble / total
      RuleResult(r.name, passed, total, rate, rate >= r.threshold)
    }
  }

  /** Same single-pass evaluation but fully lazy: returns a long-format
    * DataFrame (rule_name, passed, total, pass_rate) via one agg + stack,
    * so it composes into larger plans and never collects to the driver.
    */
  def evaluateDf(df: DataFrame, rules: Seq[QualityRule]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("total") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.predicate, 1L).otherwise(0L)).as(s"_r$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name.replace("'", "''")}', _r$i" }
      .mkString(", ")
    wide
      .selectExpr(s"stack(${rules.size}, $stackArgs) as (rule_name, passed)", "total")
      .withColumn("pass_rate", round(col("passed").cast("double") / col("total"), 6))
  }

  /** Overall score = passed rules / total rules (bronze_to_silver_orders.py:275-283). */
  def overallScore(results: Seq[RuleResult]): Double =
    if (results.isEmpty) 1.0 else results.count(_.thresholdMet).toDouble / results.size
}

/** Aggregation-rule spec: column/function/alias(/filter) interpreted into
  * Spark aggregate Columns — mirrors variables.tf:352-429's aggregation DSL.
  */
final case class AggRule(column: String, function: String, alias: String, filter: Option[String] = None) {
  def toColumn: Column = {
    val base: Column = {
      val c = filter match {
        case Some(f) => when(expr(f), col(column))
        case None    => col(column)
      }
      function.toLowerCase match {
        case "sum"            => sum(c)
        case "count"          => count(c)
        case "count_distinct" => countDistinct(c)
        case "avg" | "mean"   => avg(c)
        case "min"            => min(c)
        case "max"            => max(c)
        case "stddev"         => stddev(c)
        case other            => throw new IllegalArgumentException(s"unknown agg function: $other")
      }
    }
    base.as(alias)
  }
}

object AggRule {
  def apply(df: DataFrame, groupBy: Seq[String], rules: Seq[AggRule]): DataFrame = {
    val cols = rules.map(_.toColumn)
    if (groupBy.isEmpty) df.agg(cols.head, cols.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(cols.head, cols.tail: _*)
  }
}

/** Feature definition: name + SQL calculation string (variables.tf:431-483),
  * compiled with expr — the reference's feature strings are valid Spark SQL.
  */
final case class FeatureDef(name: String, calculation: String)

object FeatureDef {
  def applyAll(df: DataFrame, features: Seq[FeatureDef]): DataFrame =
    features.foldLeft(df)((d, f) => d.withColumn(f.name, expr(f.calculation)))
}
