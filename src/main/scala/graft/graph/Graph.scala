package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over edge DataFrames — centrality for corpus curation
  * (e.g. rank documents inside a near-dup neighborhood by how connected
  * they are, then keep the most central representative).
  *
  * Everything is integer-micros arithmetic: rank updates use only long
  * multiplication, integer division and exact long sums, so results are
  * bit-identical across engines, partitionings and runs — no doubles
  * anywhere in the iteration.
  */
object Graph {

  /** Integer-exact PageRank over an UNDIRECTED edge list (each input row
    * (a, b) is one undirected edge; the operator symmetrizes internally).
    * Ranks are in micros, damping is the exact rational 17/20 = 0.85:
    *
    *   r₀(v) = 1_000_000
    *   r_{t+1}(v) = 150_000 + Σ_{u ~ v} (r_t(u) · 17) div (20 · deg(u))
    *
    * The per-edge contribution is a single integer division (floor — all
    * quantities positive), so every engine computes the identical lattice
    * of values; no dangling-mass redistribution is needed because an
    * undirected graph has no zero-outdegree node. Nodes are the edge
    * endpoints; isolated documents simply keep no row (callers union
    * them back at the base rank if desired).
    *
    * Scale shape: each iteration is one shuffle join of the current rank
    * vector with the (symmetrized) edge list on the source plus one
    * aggregate on the destination — the standard distributed PageRank
    * step; `iterations` is small and fixed, so the composed plan stays
    * bounded. Degrees are computed once and reused.
    */
  def pageRankMicros(edges: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", iterations: Int = 5): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // The graph structure is referenced by EVERY iteration — cache it so
    // each reference is a leaf scan, not a re-expansion of the (possibly
    // expensive) upstream edge plan. Without these caches the composed
    // plan re-embeds the edge subtree ~3× per iteration (exponential
    // plan growth, observed as 241 Project nodes at 5 iterations over a
    // MinHash pair generator); with them it grows linearly. Caching the
    // edge list is the standard working set of iterative PageRank.
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"))).cache()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val nodes = sym.select(col("src").as("node")).distinct().cache()
    var r = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(r.select(col("node").as("src"), col("r")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("r * 17L div (20L * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, Seq("node"), "left")
        .na.fill(0L, Seq("s"))
        .select(col("node"), (lit(150000L) + col("s")).as("r"))
    }
    r.withColumnRenamed("r", "rank_micros")
  }

  /** The DuckDB oracle for [[pageRankMicros]] with the iterations
    * UNROLLED as chained CTEs (no recursive aggregation needed):
    * caller supplies `edgesCte`, a CTE body producing (src, dst) for the
    * UNDIRECTED pair list (one row per pair; symmetrization happens
    * here). Kept next to the operator so the lockstep between the two
    * formulas is reviewable in one place.
    */
  def pageRankOracleSql(edgesCte: String, iterations: Int = 5): String = {
    val steps = (1 to iterations).map { k =>
      s"""c$k AS (SELECT e.dst AS node, sum((p.r * 17) // (20 * d.deg)) AS s
         |  FROM e JOIN r${k - 1} p ON p.node = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY 1),
         |r$k AS (SELECT n.node, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$k c USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($edgesCte),
       |e AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$steps
       |SELECT node, r AS rank_micros FROM r$iterations""".stripMargin
  }

  /** Per-node triangle counts over an undirected edge list — the local
    * clustering signal (a doc whose near-dup neighbors are ALSO near-dups
    * of each other sits in a dense template cluster, not a chain).
    *
    * Degree-ordered orientation (Latapy 2008; the standard distributed
    * variant): orient every edge from its lower-(degree, id) endpoint to
    * the higher one — an acyclic orientation where each node's
    * out-neighborhood is O(√m) on any graph, so the wedge join
    * (out(u,v) ⋈ out(u,w)) is bounded by Σ outdeg² ≤ O(m^{3/2}), the
    * provable optimum for triangle enumeration, instead of Σ deg² which
    * a hub node makes quadratic. A wedge closes iff the oriented edge
    * (v → w) exists (v, w both out-rank u, and the wedge join emits each
    * unordered {v, w} once by rank order), so every triangle is counted
    * exactly once at its lowest-rank corner.
    *
    * The RESULT is orientation-independent — the triangle set of a graph
    * does not depend on enumeration order — which is what lets an oracle
    * replay it as the plain canonical a<b<c three-way self-join.
    *
    * Shuffles: dedup/degree (keyed), two wedge joins (keyed on node,
    * then on the closing pair), final corner aggregate. No broadcast of
    * anything graph-sized, no driver materialization.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // referenced 3x below (degrees + both wedge sides) — keep it a leaf
    val e = und.cache()
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // rank = (deg, id): total order; orient edge toward the higher rank
    val withRanks = e
      .join(deg.select(col("node").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("_db")), Seq("b"))
    val out = withRanks.select(
      when(struct(col("_da"), col("a")) < struct(col("_db"), col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("_db").as("rv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("_da").as("rv")))
        .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.rv").as("rv"))
      .cache()
    // wedges from u: unordered {v, w} emitted once (rank order on v, w)
    val wedges = out.toDF("u", "v", "rv")
      .join(out.toDF("u", "w", "rw"), Seq("u"))
      .filter(struct(col("rv"), col("v")) < struct(col("rw"), col("w")))
    // closing oriented edge is exactly v→w (v out-ranks u, w out-ranks v)
    val tri = wedges.join(
      out.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** k-core decomposition membership: iteratively peel nodes of degree
    * < k until the fixpoint — what survives is the maximal subgraph where
    * every node keeps ≥ k neighbors INSIDE the subgraph. The density
    * signal above triangles: a 2-core keeps only nodes on cycles (chains
    * and pendant docs peel away), so "near-dup cluster cores" are the
    * documents whose duplication is mutual, not incidental.
    *
    * Output: (node, core_degree) for surviving nodes — core_degree is the
    * node's degree within the k-core (≥ k by construction).
    *
    * Scale shape: each round is one degree aggregate plus two semi-joins
    * of the edge list against the surviving-node set — all keyed shuffles,
    * nothing driver-sized. The peeling converges in at most O(longest
    * chain) rounds (typically < 10 on near-dup graphs); each round's edge
    * list is localCheckpoint-truncated so the plan does not re-embed the
    * (possibly expensive) upstream generator per round. The fixpoint is
    * unique (peeling order cannot change it), which is what lets an exact
    * oracle replay simultaneous rounds and agree.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50,
      srcCol: String = "doc_a", dstCol: String = "doc_b"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    var e = und.localCheckpoint()
    var m = e.count()
    var rounds = 0
    var converged = m == 0L
    while (!converged && rounds < maxRounds) {
      val alive = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      val pruned = e
        .join(alive.select(col("node").as("a")), Seq("a"))
        .join(alive.select(col("node").as("b")), Seq("b"))
        .select("a", "b")
        .localCheckpoint()
      val m2 = pruned.count()
      converged = m2 == m || m2 == 0 // empty IS the fixpoint — no confirm round
      e = pruned
      m = m2
      rounds += 1
    }
    // A truncated peel is NOT a k-core: on a long chain at k=2 the interior
    // survives ~n/2 rounds and the final core_degree filter cannot repair
    // the miscount. Failing loudly beats silently returning a superset.
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxRounds rounds ($m edges alive); " +
          "raise maxRounds — the fixpoint needs more peeling rounds than allowed")
    e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
      .filter(col("core_degree") >= k)
  }

  /** Newman modularity of a node partition over an undirected graph —
    * the standard "is this clustering better than chance" quality
    * measure (Newman & Girvan 2004): Q = Σ_c [e_c/m − (d_c/2m)²] where
    * e_c = intra-cluster edges, d_c = total degree of cluster c, m =
    * total edges. Near-dup clusterings should score high (near-dups
    * clique up); a near-zero Q flags a clustering no better than random
    * assignment.
    *
    * Exact arithmetic: per-cluster contribution as the exact integer
    * numerator 4m·e_c − d_c² over the common denominator 4m², one
    * boundary double division per row, floor(·10⁶ + 0.5) micros — the
    * engine's standard cross-engine determinism contract. Unassigned
    * nodes (absent from `clusters`) keep their own id as a singleton
    * cluster, matching [[graft.dedup.Dedup.dedupClusters]]'s canonical
    * labels.
    *
    * Shape: edge canonicalization + two label joins + one cluster
    * groupBy — all keyed, nothing corpus-broadcast.
    *
    * Output: (cluster_id, e_in, d_tot, q_contrib_micros), one row per
    * cluster with ≥ 1 incident edge.
    */
  def modularityMicros(edges: DataFrame, clusters: DataFrame,
      srcCol: String = "doc_a", dstCol: String = "doc_b",
      idCol: String = "id", clusterCol: String = "cluster_id"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val lab = clusters.select(col(idCol).as("_id"), col(clusterCol).as("_c"))
    val m = und.agg(count(lit(1)).as("_m"))
    val labeled = und
      .join(lab.toDF("a", "_ca"), Seq("a"), "left")
      .join(lab.toDF("b", "_cb"), Seq("b"), "left")
      .select(coalesce(col("_ca"), col("a")).as("_ca"),
        coalesce(col("_cb"), col("b")).as("_cb"))
    val eIn = labeled.filter(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("cluster_id"))
      .agg(count(lit(1)).as("e_in"))
    val dTot = labeled
      .select(explode(array(col("_ca"), col("_cb"))).as("cluster_id"))
      .groupBy("cluster_id").agg(count(lit(1)).as("d_tot"))
    dTot.join(eIn, Seq("cluster_id"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib_micros", expr(
        "CAST(floor(CAST(4 * _m * e_in - d_tot * d_tot AS DOUBLE) " +
          "/ CAST(4 * _m * _m AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"))
      .select("cluster_id", "e_in", "d_tot", "q_contrib_micros")
  }

  /** DuckDB oracle for [[kCore]]: the simultaneous peeling rounds replayed
    * as a recursive CTE carrying the surviving-node list; `edgesCte` must
    * produce the deduped undirected pair list (a, b), a < b — the same
    * contract as [[pageRankOracleSql]]'s input. The final SELECT emits
    * each survivor with its degree restricted to survivors.
    *
    * `maxRounds` asymmetry: the oracle CTE stops SILENTLY at `maxRounds`
    * (recursive SQL has no throw), returning a truncated — too large —
    * fixpoint, while the engine THROWS on non-convergence. Keep the
    * oracle's bound >= the engine's: then a corpus needing more rounds
    * makes the ENGINE fail loudly (red gate), never the two agreeing on
    * a wrong answer; the oracle's truncated set cannot equal the engine's
    * converged one unless both reached the true fixpoint.
    */
  def kCoreOracleSql(edgesCte: String, k: Int, maxRounds: Int = 50,
      nodeAlias: String = "doc_id"): String = {
    val next =
      s"""(SELECT coalesce(list(id ORDER BY id), []) FROM (
         |      SELECT x.id FROM (SELECT unnest(nodes) AS id) x
         |      JOIN pairs e ON (e.a = x.id AND list_contains(nodes, e.b))
         |                   OR (e.b = x.id AND list_contains(nodes, e.a))
         |      GROUP BY 1 HAVING count(*) >= $k))""".stripMargin
    s"""WITH RECURSIVE pairs AS ($edgesCte),
       |alive AS (
       |  SELECT 0 AS step, (SELECT coalesce(list(DISTINCT x ORDER BY x), [])
       |      FROM (SELECT a AS x FROM pairs UNION SELECT b FROM pairs)) AS nodes
       |  UNION ALL
       |  SELECT step + 1, $next
       |  FROM alive WHERE step < $maxRounds AND nodes <> $next),
       |last AS (SELECT nodes FROM alive ORDER BY step DESC LIMIT 1),
       |surv AS (SELECT e.a, e.b FROM pairs e, last
       |  WHERE list_contains(last.nodes, e.a) AND list_contains(last.nodes, e.b))
       |SELECT node AS $nodeAlias, CAST(count(*) AS BIGINT) AS core_degree
       |FROM (SELECT a AS node FROM surv UNION ALL SELECT b FROM surv)
       |GROUP BY 1 HAVING count(*) >= $k""".stripMargin
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the directed edge listing (each undirected
    * edge counted both ways) — positive when hubs attach to hubs
    * (template-family duplication), negative when hubs attach to leaves
    * (one boilerplate source quoted everywhere) — which of the two
    * dedup-graph shapes the corpus has. Exact long sums end to end
    * (Σx, Σx², Σxy over exact degree counts); the only doubles are the
    * final fixed expression, so r is bit-stable across engines and
    * partitionings. Exactness bound: the numerator m·Σxy is exact while
    * m·(Σ deg²) < 2⁶³ — comfortably true for any near-dup graph this
    * engine builds (m ≤ 10⁹ edges with max degree ≤ 10⁴ stays two orders
    * under the line); re-derive before pointing it at a web graph.
    * Shape: one degree aggregate + two keyed joins + one
    * global sum — no window, no collect. Output: (m_directed, r).
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val dir = und.select(col("a").as("s"), col("b").as("t"))
      .unionByName(und.select(col("b").as("s"), col("a").as("t")))
    val deg = dir.groupBy("s").agg(count(lit(1)).as("deg"))
    dir
      .join(deg.toDF("s", "dx"), Seq("s"))
      .join(deg.toDF("t", "dy"), Seq("t"))
      .agg(count(lit(1)).as("m_directed"),
        sum(col("dx")).as("_sx"), sum(col("dy")).as("_sy"),
        sum(col("dx") * col("dx")).as("_sxx"),
        sum(col("dy") * col("dy")).as("_syy"),
        sum(col("dx") * col("dy")).as("_sxy"))
      .withColumn("r", expr(
        """CASE WHEN m_directed * _sxx - _sx * _sx > 0
          |  AND m_directed * _syy - _sy * _sy > 0
          |THEN CAST(m_directed * _sxy - _sx * _sy AS DOUBLE)
          |  / sqrt(CAST(m_directed * _sxx - _sx * _sx AS DOUBLE)
          |       * CAST(m_directed * _syy - _sy * _sy AS DOUBLE))
          |END""".stripMargin))
      .select("m_directed", "r")
  }
}
