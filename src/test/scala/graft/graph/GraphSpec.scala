package graft.graph

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankMicros on a path graph matches the hand-computed integer lattice") {
    // a - b - c: deg(a)=deg(c)=1, deg(b)=2
    val edges = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    def ranks(iters: Int) = Graph.pageRankMicros(edges, iterations = iters)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank_micros")).toMap
    // iteration 0: everyone at the initial mass
    assert(ranks(0) === Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    // iteration 1: a gets 150000 + (1e6*17) div 40 = 575000; b gets
    // 150000 + 2 * ((1e6*17) div 20) = 1850000
    assert(ranks(1) === Map("a" -> 575000L, "b" -> 1850000L, "c" -> 575000L))
    // iteration 2: a: 150000 + (1850000*17) div 40 = 936250;
    // b: 150000 + 2 * ((575000*17) div 20) = 1127500
    assert(ranks(2) === Map("a" -> 936250L, "b" -> 1127500L, "c" -> 936250L))
  }

  test("pageRankMicros: an isolated pair is stationary; hubs outrank leaves") {
    val edges = Seq(("p", "q"),                      // isolated pair
      ("h", "x"), ("h", "y"), ("h", "z")).toDF("doc_a", "doc_b") // star
    val r = Graph.pageRankMicros(edges).collect()
      .map(row => row.getString(0) -> row.getAs[Long]("rank_micros")).toMap
    // pair: deg 1 both sides -> 150000 + 850000 = 1000000 at every step
    assert(r("p") === 1000000L && r("q") === 1000000L)
    // star hub collects three leaf contributions, leaves split the hub's
    assert(r("h") > r("x"))
    assert(r("x") === r("y") && r("y") === r("z"))
    // determinism under repartitioning: exact integer lattice
    val rp = Graph.pageRankMicros(edges.repartition(5)).collect()
      .map(row => row.getString(0) -> row.getAs[Long]("rank_micros")).toMap
    assert(rp === r)
  }
}
