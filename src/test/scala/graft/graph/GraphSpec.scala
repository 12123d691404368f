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

  test("triangleCounts: triangle, K4, and a triangle-free path") {
    import spark.implicits._
    def counts(edges: Seq[(Long, Long)]) =
      Graph.triangleCounts(edges.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("triangles")).toMap
    // single triangle: every corner in exactly 1
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // K4: 4 triangles, each node in C(3,2) = 3
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path: no triangles -> no rows
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
  }

  test("triangleCounts tolerates duplicate, reversed and self-loop edges") {
    import spark.implicits._
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("doc_a", "doc_b")
    val out = Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("triangles")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts counts each triangle once regardless of a hub (skew orientation)") {
    import spark.implicits._
    // hub 0 connected to 1..6; consecutive spokes also connected -> 5 triangles
    val spokes = (1L to 6L).map(i => (0L, i))
    val rim = (1L to 5L).map(i => (i, i + 1))
    val out = Graph.triangleCounts((spokes ++ rim).toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("triangles")).toMap
    assert(out(0L) === 5L)     // hub is in every triangle
    assert(out(1L) === 1L && out(6L) === 1L)
    assert(out(3L) === 2L)     // middle spokes sit in two
  }

  test("kCore: triangle with a pendant chain — the chain peels, the cycle survives") {
    import spark.implicits._
    // triangle 1-2-3 plus chain 3-4-5; 2-core = the triangle, degree 2 each
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val out = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a pure chain has no 2-core: cascading peel empties it (this is the
    // multi-round case — each round only exposes the next endpoint)
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assert(Graph.kCore(chain, k = 2).count() === 0L)
    // ...but its 1-core is the whole chain
    assert(Graph.kCore(chain, k = 1).count() === 8L)
  }

  test("kCore: core degree is the degree INSIDE the core, and dirty input " +
      "(dups, self-loops, both orientations) is canonicalized") {
    import spark.implicits._
    // K4 on 1..4, node 1 also linked to pendants 5, 6 (and noise rows)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((1L, 5L), (5L, 1L), (1L, 6L), (2L, 2L)))
      .toDF("doc_a", "doc_b")
    val out = Graph.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    // 3-core = K4; node 1's pendant edges must NOT inflate its core degree
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore matches a driver brute-force peel on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val raw = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val edges = raw.toDF("doc_a", "doc_b")
    // reference: simultaneous peel on the canonicalized edge set
    var es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val alive = deg.filter(_._2 >= 3).keySet
      val es2 = es.filter { case (a, b) => alive(a) && alive(b) }
      changed = es2 != es
      es = es2
    }
    val wantDeg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = Graph.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(got === wantDeg)
  }

  test("modularityMicros matches the hand-computed two-triangle partition " +
      "and punishes the all-singletons partition") {
    import spark.implicits._
    // two triangles bridged by one edge: m = 7
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)).toDF("doc_a", "doc_b")
    val good = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 3L))
      .toDF("id", "cluster_id")
    val out = Graph.modularityMicros(edges, good).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("e_in"), r.getAs[Long]("d_tot"),
        r.getAs[Long]("q_contrib_micros")))).toMap
    // per triangle: e_in = 3, d_tot = 7 (6 internal slots + bridge end);
    // contribution = (4*7*3 - 49)/196 = 35/196 = 0.178571
    assert(out(0L) === ((3L, 7L, 178571L)))
    assert(out(3L) === ((3L, 7L, 178571L)))
    // singletons: every edge crosses clusters -> all e_in = 0, Q < 0
    val singletons = (0L to 5L).map(i => (i, i)).toDF("id", "cluster_id")
    val flat = Graph.modularityMicros(edges, singletons).collect()
    assert(flat.forall(_.getAs[Long]("e_in") === 0L))
    assert(flat.map(_.getAs[Long]("q_contrib_micros")).sum < 0L)
  }

  test("kCore throws on round exhaustion instead of returning a truncated " +
      "peel, and an emptying round counts as converged") {
    import spark.implicits._
    // path 0-1-...-11: k=2 peels one endpoint pair per round; the 2-core
    // is EMPTY but needs ~6 rounds to get there. maxRounds=2 must throw —
    // the surviving interior is NOT a 2-core and the final degree filter
    // cannot repair it (a ~200-node chain under the old default silently
    // returned interior nodes).
    val chain = (0 until 11).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Graph.kCore(chain, k = 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds: empty core, no throw — including when the graph
    // empties EXACTLY on the last allowed round (empty is the fixpoint,
    // no confirming round needed)
    assert(Graph.kCore(chain, k = 2, maxRounds = 6).count() === 0L)
  }

  test("degree assortativity: -1 on a star, null on a regular graph, " +
      "repartition-independent") {
    // star K1,3: center degree 3 against leaf degree 1 on every edge -> -1
    val star = Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("doc_a", "doc_b")
    val r1 = Graph.degreeAssortativity(star).collect().head
    assert(r1.getAs[Long]("m_directed") === 6L)
    assert(math.abs(r1.getAs[Double]("r") + 1.0) < 1e-12)
    // triangle: every degree 2 -> zero variance -> r undefined (null)
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("doc_a", "doc_b")
    val r2 = Graph.degreeAssortativity(tri).collect().head
    assert(r2.isNullAt(r2.fieldIndex("r")))
    // two stars joined at their centers: still hub-leaf dominated -> r < 0;
    // duplicate and reversed edge rows collapse before counting
    val two = Seq(("c1", "l1"), ("c1", "l2"), ("c1", "c2"), ("c2", "c1"),
      ("c2", "l3"), ("c2", "l4"), ("l1", "c1")).toDF("doc_a", "doc_b")
    val r3 = Graph.degreeAssortativity(two).collect().head
    assert(r3.getAs[Long]("m_directed") === 10L) // 5 undirected edges
    assert(r3.getAs[Double]("r") < 0.0)
    val r3b = Graph.degreeAssortativity(two.repartition(5)).collect().head
    assert(r3b.getAs[Double]("r") === r3.getAs[Double]("r"))
  }

  test("hitsMicros on a bipartite incidence graph matches the hand-computed lattice") {
    // c1 -> {p1, p2}, c2 -> {p1}
    val edges = Seq(("c1", "p1"), ("c1", "p2"), ("c2", "p1")).toDF("src", "dst")
    def run(iters: Int) = Graph.hitsMicros(edges, iterations = iters).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("hub_micros"), r.getAs[Long]("auth_micros")))
      .toMap
    // iter 1: a_raw(p1)=2e6, a_raw(p2)=1e6, max 2e6 -> a(p1)=1e6, a(p2)=5e5;
    // h_raw(c1)=1.5e6, h_raw(c2)=1e6, max 1.5e6 -> h(c1)=1e6, h(c2)=666666
    assert(run(1) === Map(
      "c1" -> (1000000L, 0L), "c2" -> (666666L, 0L),
      "p1" -> (0L, 1000000L), "p2" -> (0L, 500000L)))
    // iter 2: a_raw(p1)=1666666 (max), a(p2)=1e12 div 1666666 = 600000;
    // h_raw(c1)=1600000 (max), h(c2)=1e12 div 1600000 = 625000
    assert(run(2) === Map(
      "c1" -> (1000000L, 0L), "c2" -> (625000L, 0L),
      "p1" -> (0L, 1000000L), "p2" -> (0L, 600000L)))
    // fixpoint direction holds at depth: the broad hub and the shared
    // authority pin the max; pure sources carry auth 0, pure sinks hub 0
    val r4 = run(4)
    assert(r4("c1") === (1000000L, 0L) && r4("p1") === (0L, 1000000L))
    assert(r4("c2")._1 < 1000000L && r4("p2")._2 < 1000000L)
    // exact integer lattice: invariant under repartitioning
    val rp = Graph.hitsMicros(edges.repartition(5), iterations = 4).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("hub_micros"), r.getAs[Long]("auth_micros")))
      .toMap
    assert(rp === r4)
  }

  test("hitsMicros: authority follows hub quality, not raw in-degree") {
    // pX and pY both have in-degree 1, but pX's citer is a broad hub
    // (basket of 3) while pY's is single-purpose — mutual reinforcement
    // must rank a(pX) above a(pY), which a plain in-degree count cannot.
    val edges = Seq(("s1", "pY"),
      ("b1", "pX"), ("b1", "pA"), ("b1", "pB")).toDF("src", "dst")
    val r = Graph.hitsMicros(edges, iterations = 4).collect()
      .map(x => x.getString(0) -> (x.getAs[Long]("hub_micros"), x.getAs[Long]("auth_micros")))
      .toMap
    // iter 1: all authorities tie at raw 1e6, so h(b1)=3e6 -> max, and
    // h(s1) normalizes to 333333; from iter 2 on pY's authority decays
    // geometrically (333333, 111111, ...) while pX holds the max.
    assert(r("b1")._1 === 1000000L)
    assert(r("s1")._1 < 200000L)
    assert(r("pX")._2 === 1000000L)
    assert(r("pY")._2 < r("pX")._2 && r("pY")._2 > 0L)
    // the broad hub's equal-treatment picks tie exactly
    assert(r("pA")._2 === r("pX")._2 && r("pB")._2 === r("pX")._2)
  }
}
