package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConfigLoaderSpec extends SparkSpec {
  import spark.implicits._

  private val ordersJson = """{
    "data_quality_rules": {
      "orders": [
        {"name": "key_not_null", "description": "key present",
         "rule_type": "not_null", "expression": "o_orderkey IS NOT NULL"},
        {"name": "price_positive", "rule_type": "range",
         "expression": "o_totalprice > 0", "threshold": 0.99},
        {"name": "priority_format", "rule_type": "regex",
         "expression": "o_orderpriority RLIKE '^[1-5]-[A-Z ]+$'", "threshold": 0.9}
      ]
    },
    "aggregation_rules": {
      "sales_summary": [
        {"name": "daily_sales_summary", "aggregation_type": "time_series",
         "group_by_columns": ["o_orderdate"],
         "aggregate_columns": [
           {"column": "o_totalprice", "function": "sum", "alias": "daily_revenue"},
           {"column": "o_orderkey", "function": "count", "alias": "daily_orders"}
         ],
         "filters": ["o_totalprice > 0"]}
      ]
    },
    "feature_engineering_config": {
      "ml_features": [
        {"feature_name": "is_large", "feature_type": "numerical",
         "calculation": "CASE WHEN o_totalprice >= 250000 THEN 1 ELSE 0 END"}
      ]
    }
  }"""

  private lazy val orders = Seq(
    (1L, "2024-01-01", "1-URGENT", 100000.0),
    (2L, "2024-01-01", "3-MEDIUM", 300000.0),
    (3L, "2024-01-02", "9-BAD", -5.0)
  ).toDF("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")

  test("deep merge: nested objects merge, scalars and arrays replace") {
    val defaults = """{"a": {"x": 1, "y": {"z": 2}}, "list": [1, 2], "keep": "d"}"""
    val overrides = """{"a": {"y": {"z": 9}, "w": 3}, "list": [7]}"""
    val merged = ConfigLoader.loadWithDefaults(defaults, overrides)
    assert(merged.at("/a/x").asInt === 1)       // kept from defaults
    assert(merged.at("/a/y/z").asInt === 9)     // nested override wins
    assert(merged.at("/a/w").asInt === 3)       // nested addition
    assert(merged.get("list").size === 1)       // arrays replace, not concat
    assert(merged.get("keep").asText === "d")
  }

  test("JSON quality rules reproduce the Scala-defined rule results") {
    val doc = ConfigLoader.parse(ordersJson)
    val fromJson = ConfigLoader.qualityRules(doc, "orders")
    assert(fromJson.map(_.threshold) === Seq(1.0, 0.99, 0.9))
    val scalaRules = Seq(
      QualityRule("key_not_null", "o_orderkey IS NOT NULL"),
      QualityRule("price_positive", "o_totalprice > 0", 0.99),
      QualityRule("priority_format", "o_orderpriority RLIKE '^[1-5]-[A-Z ]+$'", 0.9))
    val a = RuleEngine.evaluateDf(orders, fromJson).collect().map(_.toSeq).toSet
    val b = RuleEngine.evaluateDf(orders, scalaRules).collect().map(_.toSeq).toSet
    assert(a === b)
    val results = RuleEngine.evaluate(orders, fromJson)
    assert(results.map(r => r.rule -> r.passed).toMap ===
      Map("key_not_null" -> 3L, "price_positive" -> 2L, "priority_format" -> 2L))
  }

  test("q_rules' registered rule set loads from JSON and reproduces its result") {
    val doc = ConfigLoader.parse("""{
      "data_quality_rules": { "orders": [
        {"name": "key_not_null", "expression": "o_orderkey IS NOT NULL"},
        {"name": "price_positive", "expression": "o_totalprice > 0"},
        {"name": "price_range", "expression": "o_totalprice BETWEEN 1000 AND 600000"},
        {"name": "status_valid", "expression": "o_orderstatus IN ('O','F','P')"},
        {"name": "priority_format", "expression": "o_orderpriority RLIKE '^[1-5]-[A-Z ]+$'"}
      ]}}""")
    val orders = graft.core.Tables(spark, "/root/testdata/sf0.001").orders
    val viaJson = RuleEngine.evaluateDf(orders, ConfigLoader.qualityRules(doc, "orders"))
      .collect().map(_.toSeq).toSet
    val registered = graft.SparkEntry.queries("q_rules")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(viaJson === registered)
    assert(viaJson.nonEmpty)
  }

  test("JSON agg spec filters, groups and aggregates like hand-written code") {
    val doc = ConfigLoader.parse(ordersJson)
    val specs = ConfigLoader.aggSpecs(doc, "sales_summary")
    assert(specs.map(_.name) === Seq("daily_sales_summary"))
    val got = specs.head.run(orders).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val want = orders.filter(col("o_totalprice") > 0)
      .groupBy("o_orderdate")
      .agg(sum("o_totalprice").as("daily_revenue"), count(col("o_orderkey")).as("daily_orders"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got === want)
    assert(got("2024-01-01") === ((400000.0, 2L)))
    assert(!got.contains("2024-01-02")) // filtered out
  }

  test("agg spec fails fast on missing/typo'd required array fields; filters stay optional") {
    // typo'd group_by_columns must NOT silently become a global aggregate
    val typo = ConfigLoader.parse("""{"aggregation_rules": {"s": [
      {"name": "x", "groupby_columns": ["d"],
       "aggregate_columns": [{"column": "v", "function": "sum", "alias": "sv"}]}]}}""")
    val e1 = intercept[IllegalArgumentException](ConfigLoader.aggSpecs(typo, "s"))
    assert(e1.getMessage.contains("group_by_columns"))

    val noAggs = ConfigLoader.parse(
      """{"aggregation_rules": {"s": [{"name": "x", "group_by_columns": ["d"]}]}}""")
    val e2 = intercept[IllegalArgumentException](ConfigLoader.aggSpecs(noAggs, "s"))
    assert(e2.getMessage.contains("aggregate_columns"))

    // filters absent is fine (optional field)
    val ok = ConfigLoader.parse("""{"aggregation_rules": {"s": [
      {"name": "x", "group_by_columns": ["d"],
       "aggregate_columns": [{"column": "v", "function": "sum", "alias": "sv"}]}]}}""")
    assert(ConfigLoader.aggSpecs(ok, "s").head.filters.isEmpty)
  }

  test("JSON feature definitions compile and apply") {
    val doc = ConfigLoader.parse(ordersJson)
    val feats = ConfigLoader.features(doc, "ml_features")
    val out = FeatureDef.applyAll(orders, feats)
    assert(out.columns.contains("is_large"))
    assert(out.filter(col("is_large") === 1).count() === 1)
  }
}
