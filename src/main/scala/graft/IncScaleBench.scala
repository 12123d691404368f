package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, PairGraph}

/** Scale validation for incremental standing-artifact maintenance: a
  * FIXED-size crawl batch is appended against corpora of increasing
  * size, comparing the incremental path (batch edges + touched-component
  * re-cluster, standing artifacts pre-materialized) with a full rebuild
  * over the union. The claim under test: append wall time is governed by
  * the batch, the rebuild's by the corpus — so the gap WIDENS with the
  * corpus, which is exactly why the standing artifacts exist.
  *
  * Usage: runMain graft.IncScaleBench [n1 n2 ...]   (default 20000 80000)
  */
object IncScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(20000, 80000)
    val batchN = 2000
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    def synth(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.select(col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(1, 60),
        | j -> concat('t', CAST(abs(xxhash64(id, j)) % 1000 AS STRING))))""".stripMargin)
        .as("text"))
    for (n <- sizes) {
      val corpus = synth(spark.range(n)).cache()
      // batch: half novel docs, half near-copies of corpus docs 0..batchN/2
      // (every 15th token swapped — the DedupScaleBench planted shape)
      val novel = synth(spark.range(n + batchN / 2, n + batchN))
      val copies = spark.range(batchN / 2).select((col("id") + n).as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(1, 60),
          | j -> CASE WHEN j % 15 = 0 THEN concat('x', CAST(j AS STRING))
          |   ELSE concat('t', CAST(abs(xxhash64(id, j)) % 1000 AS STRING)) END))""".stripMargin)
          .as("text"))
      val batch = novel.unionByName(copies).cache()
      corpus.count(); batch.count()
      // standing artifacts, pre-materialized (not billed to the append —
      // in production they persist from yesterday's run)
      val standingPairs = Dedup.jaccardPairsScalable(corpus, "doc_id",
        n = 3, minJaccard = 0.5, numHashTables = 8)
        .select("doc_a", "doc_b", "jaccard").localCheckpoint()
      val standingClusters = Dedup.dedupClusters(standingPairs).localCheckpoint()

      val t0 = System.nanoTime()
      val (pairs, clusters) = PairGraph.appendBatch(
        standingPairs, standingClusters, corpus, batch, "doc_id")
      val (np, nc) = (pairs.count(), clusters.count())
      val dtInc = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val rebuilt = Dedup.jaccardPairsScalable(corpus.unionByName(batch),
        "doc_id", n = 3, minJaccard = 0.5, numHashTables = 8)
        .select("doc_a", "doc_b", "jaccard").localCheckpoint()
      val nrc = Dedup.dedupClusters(rebuilt).count()
      val dtFull = (System.nanoTime() - t1) / 1e9

      println(f"corpus=$n batch=$batchN pairs=$np clusters=$nc (rebuild $nrc) " +
        f"append=$dtInc%.1f s rebuild=$dtFull%.1f s speedup=${dtFull / dtInc}%.1fx")
      spark.catalog.clearCache()
    }

    // The ORDER-needing suffix statistics' production contract, priced:
    // the standing ladder extends EQUALITY-consistently per night
    // (batchRanksVsCorpus — dictionary probes, the cheap row), while
    // maxDupSpanExact/LCP stats re-sort on a periodic cadence (the
    // rebuild row). An order-consistent merge was adjudicated out:
    // placing novel ranks BETWEEN corpus ranks needs either
    // index-sized interpolation sorts per append (the top-level rank
    // dictionary approaches corpus-position cardinality, so that IS the
    // re-sort) or a lockstep binary-search descent costing
    // log(N)·log(L) chained corpus-scan joins per append — both worse
    // than the rebuild they would replace at realistic batch:corpus
    // ratios. These rows price the chosen cadence.
    for (n <- Seq(5000, 20000)) {
      import graft.text.ExactSubstr
      val corpus = synth(spark.range(n)).cache()
      val batch = synth(spark.range(n, n + 500)).cache()
      corpus.count(); batch.count()
      val t3 = System.nanoTime()
      val rounds = ExactSubstr.orderedSuffixRounds(corpus, "doc_id",
        prefixLen = 64)
      val nTop = rounds.last._2.count()
      val dtLadder = (System.nanoTime() - t3) / 1e9
      // the standing index = ladder levels + token dict + per-level pair
      // dicts, ALL materialized at refresh time (the r11 contract:
      // "rederivable from materialized ladder levels ... index-build-time
      // work paid once per level") — the nightly append pays probes only
      val dict = ExactSubstr.corpusTokenDict(corpus, "doc_id")
        .localCheckpoint()
      val byLevel = rounds.toMap
      val pairDicts = Seq(2, 4, 8, 16, 32, 64).map(h =>
        h -> ExactSubstr.pairDictFromLadder(byLevel(h / 2), byLevel(h),
          h / 2, "doc_id").localCheckpoint()).toMap
      val t4 = System.nanoTime()
      val ext = ExactSubstr.batchRanksVsCorpus(batch, "doc_id", "text",
        rounds, dict, prefixLen = 64, pairDicts = pairDicts)
      val nExt = ext.last._2.count()
      val dtAppend = (System.nanoTime() - t4) / 1e9
      println(f"ladder corpus=$n positions=$nTop rebuild=$dtLadder%.1f s " +
        f"batch=500 ext_positions=$nExt append=$dtAppend%.1f s " +
        f"rebuild_vs_append=${dtLadder / dtAppend}%.1fx")
      spark.catalog.clearCache()
    }

    // IVF assignment at a PRODUCTION codebook size — 1024 cells × 128
    // dims = 131k doubles, 8× past IvfAssignExprMaxDoubles, so this row
    // exercises the broadcast-variable argmin fallback (the compiled-
    // expression path would be a multi-MB SQL text past codegen limits).
    // 50k vectors ≈ 6.5G fused multiply-adds of real assignment work.
    {
      import graft.similarity.Similarity
      val dim = 128; val cells = 1024; val nVec = 50000
      val vecs = spark.range(nVec).select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), j -> sin(CAST(id * $dim + j AS DOUBLE)))")
          .as("embedding")).cache()
      vecs.count()
      val cents = spark.range(cells).select(col("id").cast("int").as("cell"),
        expr(s"transform(sequence(1, $dim), j -> cos(CAST(id * $dim + j AS DOUBLE)))")
          .as("centroid")).localCheckpoint()
      val t2 = System.nanoTime()
      val assigned = Similarity.ivfAssign(vecs, "vec_id", cents)
      val (nAssigned, nCells) = (assigned.count(),
        assigned.select("cell").distinct().count())
      val dtAssign = (System.nanoTime() - t2) / 1e9
      println(f"ivf_assign vectors=$nVec codebook=${cells}x$dim " +
        f"assigned=$nAssigned cells_used=$nCells broadcast_path=true " +
        f"assign=$dtAssign%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
