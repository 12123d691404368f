package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the interpreted HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(9)
    val df = (1 to 50).map(_ =>
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
      .toDF("a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // array() inputs (codegen-able), range source — a transform() lambda or
    // LocalTableScan would break the span regardless of graft_dot.
    val df = spark.range(10).selectExpr(
      "array(CAST(id AS DOUBLE), CAST(id + 1 AS DOUBLE)) AS a",
      "array(CAST(id * 2 AS DOUBLE), CAST(id - 1 AS DOUBLE)) AS b")
    val q = df.select(expr("graft_dot(a, b)").as("d"))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the Project evaluating graft_dot sits INSIDE a WholeStageCodegen span
    assert(formatted.contains("Project [codegen id"), formatted)
    assert(q.agg(sum("d")).head.getDouble(0) > 0) // executes the generated code
  }

  test("GraftExtensions wires the same builder through SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
    // the injected builder constructs the native expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = DotProduct(Literal.create(Array(1.0)), Literal.create(Array(2.0)))
    assert(e.prettyName === "graft_dot")
  }

  test("null arrays yield null, mismatched lengths use the shorter prefix") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0, 99.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }
}
