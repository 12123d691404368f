package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style tests for the rule DSL: over seeded random frames and
  * predicate sets, the single-pass engine must agree with per-rule filter
  * counts and keep pass rates in [0, 1]. (Plain seeded generation — the
  * scalatest/scalacheck bridge artifact is not on the classpath.)
  */
class RulesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val predicatePool = Seq(
    "x > 0", "x <= 50", "x BETWEEN -10 AND 10", "y IS NOT NULL",
    "y RLIKE '^[av]'", "y IN ('alpha', 'beta')", "x * 2 > y_len",
    "x % 2 = 0 AND y IS NOT NULL")
  private val words = Seq("alpha", "beta", "velvet", "zig", null)

  private def randomFrame(rnd: scala.util.Random) = {
    val n = 1 + rnd.nextInt(60)
    (1 to n).map(_ => (rnd.nextInt(201) - 100, words(rnd.nextInt(words.size))))
      .toDF("x", "y")
      .withColumn("y_len", coalesce(length(col("y")), lit(0)))
  }

  test("single-pass evaluation equals per-rule filtered counts over random frames") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val df = randomFrame(rnd).cache()
      val rules = rnd.shuffle(predicatePool).take(1 + rnd.nextInt(4))
        .zipWithIndex.map { case (p, i) => QualityRule(s"r$i", p) }
      val results = RuleEngine.evaluate(df, rules)
      val total = df.count()
      for ((rule, res) <- rules.zip(results)) {
        assert(res.passed === df.filter(expr(rule.expression)).count(),
          s"trial $trial rule '${rule.expression}'")
        assert(res.total === total)
        assert(res.passRate >= 0.0 && res.passRate <= 1.0)
      }
      df.unpersist()
    }
  }

  test("evaluateDf agrees with eager evaluation over random frames") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val df = randomFrame(rnd).cache()
      val rules = rnd.shuffle(predicatePool).take(3)
        .zipWithIndex.map { case (p, i) => QualityRule(s"r$i", p) }
      val lazyCounts = RuleEngine.evaluateDf(df, rules).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val eager = RuleEngine.evaluate(df, rules).map(r => r.rule -> r.passed).toMap
      assert(lazyCounts === eager, s"trial $trial")
      df.unpersist()
    }
  }
}
