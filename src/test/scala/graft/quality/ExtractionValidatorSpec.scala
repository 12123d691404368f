package graft.quality

import graft.SparkSpec

class ExtractionValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val config = ExtractionValidator.Config(
    minRows = 3,
    requiredColumns = Seq("id", "email"),
    nonNullColumns = Map("email" -> 25.0),
    uniqueKeys = Seq("id"))

  test("valid batch passes all checks") {
    val df = Seq((1, "a@x"), (2, "b@x"), (3, "c@x"), (4, null))
      .toDF("id", "email") // 25% nulls == cap, not above
    val r = ExtractionValidator.validate(df, config)
    assert(r.valid && r.rows === 4)
  }

  test("violations are itemized per failed check") {
    val df = Seq((1, null.asInstanceOf[String]), (1, null.asInstanceOf[String]))
      .toDF("id", "email")
    val r = ExtractionValidator.validate(df, config)
    assert(!r.valid)
    val kinds = r.violations.map(_.check).toSet
    assert(kinds === Set("min_rows", "null_pct", "duplicate_keys"))
  }

  test("missing required column is reported without touching data") {
    val df = Seq(1, 2, 3).toDF("id")
    val r = ExtractionValidator.validate(df, config)
    assert(r.violations.exists(v => v.check === "required_column" && v.detail.contains("email")))
  }
}
