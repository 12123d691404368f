package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "bal")

  private def source = Seq(
    (2L, "b2", 25.0), (4L, "d", 40.0)
  ).toDF("id", "name", "bal")

  test("matched rows update only updateCols; new keys insert whole rows; " +
      "target-only keys keep") {
    val out = Merge.merge(target, source, "id", updateCols = Seq("bal"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq ===
      Seq(
        (1L, "a", 10.0, "keep"),    // not matched by source
        (2L, "b", 25.0, "update"),  // bal from source, name kept
        (3L, "c", 30.0, "keep"),
        (4L, "d", 40.0, "insert"))) // whole source row
  }

  test("deleteUnmatched removes target-only keys (NOT MATCHED BY SOURCE THEN DELETE)") {
    val out = Merge.merge(target, source, "id", Seq("bal"), deleteUnmatched = true)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 4L))
    assert(out.map(_.getString(3)).toSeq === Seq("update", "insert"))
  }

  test("merge is one full-outer join: exactly one join and no union in the plan") {
    val plan = Merge.merge(target, source, "id", Seq("bal"))
      .queryExecution.optimizedPlan.toString
    assert("(?i)join".r.findAllIn(plan).size === 1, plan)
    assert(!plan.toLowerCase.contains("union"), plan)
  }

  test("source missing a target column is rejected") {
    intercept[IllegalArgumentException] {
      Merge.merge(target, source.drop("name"), "id", Seq("bal"))
    }
  }
}
