package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val long = Seq(
    (1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L)
    // (2, "b") absent -> pivot null -> melt must drop it
  ).toDF("id", "k", "v")

  test("melt(pivot(x)) round-trips to the long form (nulls dropped)") {
    val wide = long.groupBy("id").pivot("k", Seq("a", "b")).agg(sum("v"))
    val back = Reshape.melt(wide, Seq("id"), Seq("a", "b"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back === Set((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L)))
  }

  test("dropNulls=false keeps the dense grid") {
    val wide = long.groupBy("id").pivot("k", Seq("a", "b")).agg(sum("v"))
    val dense = Reshape.melt(wide, Seq("id"), Seq("a", "b"), "k", "v", dropNulls = false)
    assert(dense.count() === 4L)
    assert(dense.filter(col("v").isNull).count() === 1L)
  }

  test("melt is shuffle-free: no Exchange in the plan") {
    val wide = Seq((1L, 10L, 20L)).toDF("id", "a", "b")
    val plan = Reshape.melt(wide, Seq("id"), Seq("a", "b"), "k", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
