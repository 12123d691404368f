package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 10.0, "O", "a@x.com"),
    (2, -5.0, "F", "bad"),
    (3, 20.0, "P", "c@y.org"),
    (4, 0.0, "Z", null)
  ).toDF("id", "amount", "status", "email")

  test("single-pass evaluate matches per-rule filter counts") {
    val rules = Seq(
      QualityRule("amount_pos", "amount > 0"),
      QualityRule("status_valid", "status IN ('O','F','P')"),
      QualityRule("email_fmt", "email RLIKE '^[^@]+@[^@]+\\\\.[a-z]+$'"))
    val results = RuleEngine.evaluate(df, rules)
    for ((rule, res) <- rules.zip(results)) {
      assert(res.passed === df.filter(expr(rule.expression)).count(), rule.name)
      assert(res.total === 4)
    }
    assert(results.map(_.rule) === Seq("amount_pos", "status_valid", "email_fmt"))
  }

  test("evaluateDf long format matches evaluate") {
    val rules = Seq(QualityRule("amount_pos", "amount > 0", threshold = 0.9),
      QualityRule("status_valid", "status IN ('O','F','P')"))
    val long = RuleEngine.evaluateDf(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val eager = RuleEngine.evaluate(df, rules).map(r => r.rule -> r.passed).toMap
    assert(long === eager)
  }

  test("null predicate results count as failing the rule") {
    val rules = Seq(QualityRule("email_like", "email LIKE '%@%'"))
    val res = RuleEngine.evaluate(df, rules).head
    assert(res.passed === 2) // null email row is neither true nor false -> not passed
  }

  test("overallScore is fraction of rules meeting threshold") {
    val results = Seq(
      RuleResult("a", 4, 4, 1.0, thresholdMet = true),
      RuleResult("b", 1, 4, 0.25, thresholdMet = false))
    assert(RuleEngine.overallScore(results) === 0.5)
  }

  test("AggRule interpreter applies function, alias and filter") {
    val out = AggRule(df, Seq.empty, Seq(
      AggRule("amount", "sum", "total"),
      AggRule("amount", "avg", "mean", filter = Some("amount > 0")),
      AggRule("id", "count_distinct", "ids"))).collect().head
    assert(out.getAs[Double]("total") === 25.0)
    assert(out.getAs[Double]("mean") === 15.0)
    assert(out.getAs[Long]("ids") === 4L)
  }

  test("FeatureDef.applyAll compiles SQL calculations") {
    val out = FeatureDef.applyAll(df, Seq(
      FeatureDef("double_amount", "amount * 2"),
      FeatureDef("is_big", "CASE WHEN amount >= 10 THEN 1 ELSE 0 END")))
    assert(out.filter("is_big = 1").count() === 2)
    assert(out.filter("id = 1").select("double_amount").head.getDouble(0) === 20.0)
  }
}
