package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_nfc composes decomposed sequences; ASCII is untouched") {
    val df = Seq(
      (1L, "cafe\u0301"),      // e + combining acute
      (2L, "caf\u00e9"),       // precomposed
      (3L, "plain ascii")).toDF("id", "s")
    val out = df.select(col("id"), expr("graft_nfc(s)").as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "caf\u00e9")      // composed
    assert(out(1L) === out(2L))          // canonical equality after NFC
    assert(out(3L) === "plain ascii")
  }

  test("graft_nfc makes hash-keyed dedup see canonically-equal texts (the motivation)") {
    val df = Seq((1L, "cafe\u0301"), (2L, "caf\u00e9")).toDF("id", "s")
    val raw = df.select(countDistinct(md5(col("s")))).head().getLong(0)
    val norm = df.select(countDistinct(md5(expr("graft_nfc(s)")))).head().getLong(0)
    assert(raw === 2L)   // byte-different -> exact dedup misses the pair
    assert(norm === 1L)  // NFC first -> the duplicate is found
  }

  test("graft_nfc handles null and participates in codegen") {
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // projection, so an actual WholeStageCodegen stage exists to inspect
    val df = Seq(Some("cafe\u0301"), None).toDF("s").repartition(2)
    val out = df.select(expr("graft_nfc(s)").as("n"))
    assert(out.collect().map(r => Option(r.getString(0))).toSet
      === Set(Some("caf\u00e9"), None))
    // the "*(n)" prefix is the WholeStageCodegen marker in plan strings
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("* Project") || plan.contains("*(1) Project"))
  }
}
