package graft.similarity

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def run(k: Int, pts: Seq[(Long, Seq[Float])]) =
    Coreset.kCenterGreedy(pts.toDF("vec_id", "embedding"), "vec_id", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("farthest-point trajectory and objective match hand computation") {
    // collinear points at x = 0, 10, 1, 5 (ids 1..4): seed is min id 1,
    // then the far end (10), then the midpoint (5); coverage radius is
    // point 3's distance to the seed.
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(1f, 0f)), (4L, Seq(5f, 0f)))
    assert(run(3, pts) === Seq(
      (1L, 1L, -1L),                      // seed, -1 sentinel
      (2L, 2L, 100000000000000L),         // (10e6)^2
      (3L, 4L, 25000000000000L),          // (5e6)^2
      (4L, -1L, 1000000000000L)))         // objective: (1e6)^2
  }

  test("k larger than the corpus fails loudly, not with an opaque index error") {
    // exhaustion is detected lazily inside the loop (no eager
    // distinct-count pass on the happy path), so the error names the
    // round the argmax ran dry
    val pts = Seq((1L, Seq(0f, 0f)), (2L, Seq(3f, 0f)))
    val e = intercept[IllegalArgumentException] { run(3, pts) }
    assert(e.getMessage.contains("at least k=3") &&
      e.getMessage.contains("exhausted after 2"))
    val empty = intercept[IllegalArgumentException] {
      run(1, Seq.empty[(Long, Seq[Float])])
    }
    assert(empty.getMessage.contains("corpus is empty"))
  }

  test("argmax ties break to the smaller id; duplicates collapse the objective to 0") {
    val pts = Seq((1L, Seq(0f, 0f)), (2L, Seq(3f, 0f)), (3L, Seq(3f, 0f)))
    assert(run(2, pts) === Seq(
      (1L, 1L, -1L),
      (2L, 2L, 9000000000000L),           // tie with id 3 -> smaller id
      (3L, -1L, 0L)))                     // id 3 sits ON center 2
  }

  test("quantization is floor(x*1e6 + 0.5) on both signs; k=1 degenerates to seed + objective") {
    // -0.3 -> -300000, 0.5 -> 500000: d2 = (800000)^2 per axis
    val pts = Seq((7L, Seq(-0.3f, -0.3f)), (9L, Seq(0.5f, 0.5f)))
    assert(run(1, pts) === Seq(
      (1L, 7L, -1L),
      (2L, -1L, 2L * 800000L * 800000L)))
  }
}
