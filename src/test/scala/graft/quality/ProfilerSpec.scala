package graft.quality

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("per-column n/null/distinct in one pass; key and constant columns readable off the profile") {
    val df = Seq(
      (Some(1L), "x", Some(10L)),
      (Some(1L), "x", Some(20L)),
      (Some(2L), "x", Some(30L)),
      (None, "x", Some(40L))).toDF("a", "b", "k")
    val p = Profiler.profile(df, Seq("a", "b", "k")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct")))
      .toMap
    assert(p("a") === (4L, 1L, 2L))  // distinct counts non-null only
    assert(p("b") === (4L, 0L, 1L))  // constant column: n_distinct = 1
    assert(p("k") === (4L, 0L, 4L))  // key candidate: n_distinct = n_rows - n_null
    assertThrows[IllegalArgumentException] {
      Profiler.profile(df, Seq.empty)
    }
  }
}
