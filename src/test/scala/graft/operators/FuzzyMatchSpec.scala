package graft.operators

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val recs = Seq(
    (1L, "US", "John Smith"),
    (2L, "US", "Jon Smith"),    // dist 1 from John Smith
    (3L, "US", "Johnny Smythe"),// dist > 2 from both
    (4L, "DE", "John Smith"),   // exact name but different block -> never paired
    (5L, "US", "  john smith ") // normalizes equal to 1 -> dist 0
  ).toDF("id", "country", "name")

  test("pairs within maxDist inside a block, normalized, each pair once") {
    val out = FuzzyMatch.blockedSelfMatch(recs, "id", "name", Seq("country"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out === Map((1L, 2L) -> 1, (1L, 5L) -> 0, (2L, 5L) -> 1))
  }

  test("blocking prevents cross-block comparisons even for identical names") {
    val out = FuzzyMatch.blockedSelfMatch(recs, "id", "name", Seq("country"), maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!out.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("linkage across two frames keeps all qualifying cross pairs") {
    val left = Seq((10L, "US", "Anna Lee")).toDF("id", "country", "name")
    val right = Seq((20L, "US", "Ana Lee"), (21L, "US", "Bob Ray")).toDF("id", "country", "name")
    val out = FuzzyMatch.blockedLinkage(left, right, "id", "name", Seq("country"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((10L, 20L, 1)))
  }

  test("length lower bound never drops a true pair (it is a bound, not a heuristic)") {
    // dist("ab", "abcd") = 2 = length gap: survives the prefilter at maxDist 2
    val df = Seq((1L, "x", "ab"), (2L, "x", "abcd")).toDF("id", "b", "name")
    val out = FuzzyMatch.blockedSelfMatch(df, "id", "name", Seq("b"), 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq === Seq((1L, 2L, 2)))
  }
}
