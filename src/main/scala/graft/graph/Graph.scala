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
    // lazy checkpoints throughout the peel: lineage still truncates to a
    // flat leaf per round, but materialization happens inside the round's
    // own count() instead of a separate eager job — halves the actions
    // per round (job-count bound at bench scale)
    var e = und.localCheckpoint(eager = false)
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
        .localCheckpoint(eager = false)
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

  /** Integer-exact HITS (Kleinberg 1999) over a DIRECTED edge list —
    * hubs point at good authorities, authorities are pointed at by good
    * hubs. On a bipartite incidence graph (customer → purchased part,
    * crawler → fetched page) the hub side ranks broad consumers and the
    * authority side ranks widely-consumed items — the mutual-
    * reinforcement ranking a plain degree count misses (an authority
    * cited only by one-link spam nodes ranks below one cited by broad
    * hubs).
    *
    * The classical L2 normalization is irrational; this uses the equally
    * standard max-normalization (scores in [0, 1] of the max, here
    * integer micros), which keeps EVERY intermediate an exact Long:
    *
    *   h₀(v) = 1_000_000
    *   a_t(v) = (Σ_{u→v} h_{t−1}(u)) · 1_000_000 div max_raw_a
    *   h_t(u) = (Σ_{u→v} a_t(v))     · 1_000_000 div max_raw_h
    *
    * so the fixpoint ranking replays bit-for-bit on any engine. The
    * invariant max > 0 holds whenever `edges` is nonempty (h₀ > 0 and
    * every edge has a source), so the division is total. Multi-edges
    * count with multiplicity — dedupe upstream for incidence semantics.
    *
    * Overflow: raw sums are bounded by 10⁶ · max-degree, so any graph
    * with degree below ~9·10¹² is exact — far past anything this engine
    * materializes.
    *
    * Scale shape per iteration: two keyed join+aggregate passes over the
    * edge list (the same working set as [[pageRankMicros]], cached once)
    * plus two broadcast 1-row max scalars. `iterations` is small and
    * fixed; nothing graph-sized crosses the driver.
    *
    * Output: (node, hub_micros, auth_micros) over all endpoint nodes —
    * pure sources carry auth 0, pure sinks carry hub 0.
    */
  def hitsMicros(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // The edge list is the iteration's working set; each half-iteration
    // joins it with the node-sized score vector and then aggregates by the
    // OTHER endpoint. Cache two copies, each pre-partitioned by the key the
    // step GROUPS on (guide §2.4 — two operations keyed the same way share
    // one exchange): when the planner broadcasts the score vector (it is
    // node-sized — AQE picks this whenever it fits), the join preserves the
    // cached partitioning and the groupBy needs NO exchange, so the edge
    // table never moves again after the two cache fills; when the vector is
    // too big to broadcast (web-scale graphs) the step degrades to the same
    // two exchanges the naive form always paid. The second copy reparti-
    // tions the FIRST cache, so the upstream edge build runs exactly once.
    val eDst = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("dst")).cache()
    val eSrc = eDst.repartition(col("src")).cache()
    val nodes = eDst.select(col("src").as("node"))
      .unionByName(eDst.select(col("dst").as("node"))).distinct().cache()
    // Each raw sum feeds BOTH its max-normalizer scalar and the join that
    // consumes it, and each normalized vector feeds both the next step and
    // the final output, so the composed LOGICAL plan re-embeds the whole
    // chain 4× per iteration — caching doesn't help (the analyzed tree is
    // built before cache substitution) and a 4-iteration run exhausts the
    // heap on plan nodes alone. Truncate lineage per vector with an eager
    // localCheckpoint (node-sized data — the engine's standard pattern
    // for iterative joins, same as kCore/BPE): every iteration then
    // starts from a flat in-memory leaf.
    //
    // ONE eager action per half-iteration (guide §1.2 — the job count, not
    // the data, was the wall at bench scale): the raw sum is cache()d (its
    // two consumers — the broadcast max subtree and the normalizing
    // projection — share one computation lazily) and only the normalized
    // vector is checkpointed. Nodes with no in/out contributions are NOT
    // re-attached per iteration: an absent row behaves exactly like its
    // filled 0 in every downstream keyed sum (0 contributes nothing) and
    // cannot carry the max (the invariant max > 0 has a witness row), so
    // the fill-with-zeros happens ONCE at the output join instead of 8
    // times through the loop. Scores are unchanged row-for-row.
    def maxNorm(rawDf: DataFrame, c: String): DataFrame = {
      val raw = rawDf.cache()
      val m = raw.agg(max(col(c)).as("_mx"))
      raw.crossJoin(broadcast(m))
        .select(col("node"), expr(s"$c * 1000000L div _mx").as(c))
        .localCheckpoint()
    }
    var h = nodes.withColumn("h", lit(1000000L))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      a = maxNorm(eDst.join(h.select(col("node").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("h").as("a")), "a")
      h = maxNorm(eSrc.join(a.select(col("node").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum("a").as("h")), "h")
    }
    nodes.join(h, Seq("node"), "left").na.fill(0L, Seq("h"))
      .join(a, Seq("node"), "left").na.fill(0L, Seq("a"))
      .select(col("node"), col("h").as("hub_micros"), col("a").as("auth_micros"))
  }

  /** DuckDB oracle for [[hitsMicros]], iterations unrolled as chained
    * CTEs (same contract as [[pageRankOracleSql]]): `edgesCte` produces
    * the directed (src, dst) rows. Kept adjacent so the two formulas
    * stay in reviewable lockstep.
    */
  def hitsOracleSql(edgesCte: String, iterations: Int = 4): String = {
    // Every iteration CTE is referenced twice (the next step's join AND
    // its own max-normalizer scalar subquery) — without MATERIALIZED,
    // inlining re-expands the whole chain per reference and the replay
    // goes exponential in `iterations` (the SQL twin of the plan-growth
    // problem the Spark side solves by caching the working set).
    val steps = (1 to iterations).map { k =>
      s"""ar$k AS MATERIALIZED (SELECT e.dst AS node, sum(h.h) AS a
         |  FROM e JOIN h${k - 1} h ON h.node = e.src GROUP BY 1),
         |a$k AS MATERIALIZED (SELECT n.node,
         |    CAST(coalesce(a.a, 0) * 1000000 // (SELECT max(a) FROM ar$k) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN ar$k a USING (node)),
         |hr$k AS MATERIALIZED (SELECT e.src AS node, sum(a.a) AS h
         |  FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
         |h$k AS MATERIALIZED (SELECT n.node,
         |    CAST(coalesce(h.h, 0) * 1000000 // (SELECT max(h) FROM hr$k) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN hr$k h USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesCte),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |$steps
       |SELECT n.node, h.h AS hub_micros, a.a AS auth_micros
       |FROM nodes n JOIN h$iterations h USING (node) JOIN a$iterations a USING (node)""".stripMargin
  }
}
