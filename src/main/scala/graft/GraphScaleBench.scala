package graft

import org.apache.spark.sql.functions._

/** Scale validation for the graph operators (PageRank, triangles,
  * k-core) and the interval overlap join, on synthetic graphs far larger
  * than the sf0.1 near-dup graph. Claims under test:
  *
  * - `Graph.triangleCounts` stays O(m^{3/2}) under a hub: the
  *   degree-ordered orientation bounds every out-neighborhood, so a
  *   power-law-ish graph scales like its wedge count, not deg² of the
  *   hottest node.
  * - `Graph.kCore` converges in a handful of data-bounded rounds and its
  *   per-round cost tracks the SURVIVING edge set (peeling shrinks work
  *   monotonically); wall grows ~linearly in edges.
  * - `RangeJoin.intervalOverlap` candidates scale with true overlaps,
  *   not |L|×|R|.
  *
  * Usage: runMain graft.GraphScaleBench [m1 m2 ...] (default 250000 1000000)
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(250000, 1000000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    for (m <- sizes) {
      val n = m / 5 // ~5 edges per node
      // skewed edge list: src = min of two uniform draws (quadratic
      // density toward low ids — hubs), dst uniform; a deliberate hub
      // stressor for the orientation bound
      val edges = spark.range(m).select(
          least(abs(xxhash64(col("id"), lit(1))) % lit(n.toLong),
            abs(xxhash64(col("id"), lit(2))) % lit(n.toLong)).as("doc_a"),
          (abs(xxhash64(col("id"), lit(3))) % lit(n.toLong)).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .cache()
      edges.count()

      val t0 = System.nanoTime()
      val tri = graph.Graph.triangleCounts(edges)
        .agg(sum("triangles")).head.getLong(0)
      val tTri = (System.nanoTime() - t0) / 1e9
      println(f"m=$m triangles_sum=$tri sec=$tTri%.1f")

      val t1 = System.nanoTime()
      val core = graph.Graph.kCore(edges, k = 4)
      val (nodes, minDeg) = {
        val r = core.agg(count(lit(1)), min("core_degree")).head
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val tCore = (System.nanoTime() - t1) / 1e9
      // invariant: every survivor keeps >= k neighbors inside the core
      require(nodes == 0L || minDeg >= 4L, s"k-core invariant violated: $minDeg")
      println(f"m=$m kcore_nodes=$nodes min_core_deg=$minDeg sec=$tCore%.1f")

      val t2 = System.nanoTime()
      val pr = graph.Graph.pageRankMicros(edges, iterations = 3)
        .agg(count(lit(1))).head.getLong(0)
      val tPr = (System.nanoTime() - t2) / 1e9
      println(f"m=$m pagerank_nodes=$pr sec=$tPr%.1f")

      // overlap join: m/10 intervals per side, span <= 40 on a 2m axis;
      // expected overlaps ~ |L|·|R|·80/(2m) = m/40 — far below |L|×|R|
      val mkSide = (seed: Int, loName: String, hiName: String) =>
        spark.range(m / 10).select(
          col("id").as(s"${loName}_id"),
          (abs(xxhash64(col("id"), lit(seed))) % lit(2L * m)).as(loName))
          .withColumn(hiName,
            col(loName) + abs(xxhash64(col(s"${loName}_id"), lit(seed + 1))) % 40)
      val t3 = System.nanoTime()
      val ov = operators.RangeJoin.intervalOverlap(
        mkSide(11, "l_lo", "l_hi"), mkSide(13, "r_lo", "r_hi"),
        Seq.empty, "l_lo", "l_hi", "r_lo", "r_hi",
        c => c, bucketWidth = 64L).count()
      val tOv = (System.nanoTime() - t3) / 1e9
      println(f"m=$m overlap_pairs=$ov sec=$tOv%.1f")

      edges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
