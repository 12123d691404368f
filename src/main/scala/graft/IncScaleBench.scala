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
    // The suffix-index STORE's production economics, priced end-to-end
    // against the PERSISTED artifact (graft.text.SuffixIndexStore):
    //  - rebuild  = bootstrapCommitted (full ordered re-sort + dicts +
    //    commit) — the cadence the ORDER-needing statistics pay;
    //  - append   = appendBatchCommitted (dictionary-probe extension +
    //    the grown tables streaming through to the next version);
    //  - probe    = batchSpanCoverageVsCorpus off the committed tables
    //    with metadata maxima (the nightly read path — what the
    //    registry's q_incladder/q_incremoval bill per night).
    // The claim: the PROBE (the per-night read path) is batch-governed
    // and grows sub-linearly in the corpus; append and rebuild are both
    // O(index) — the append because a versioned commit streams the grown
    // tables through (the SuffixIndexStore trade: sequential copy-through
    // I/O, no shuffle, no sort), the rebuild because it pays the
    // log-rounds of distributed sorts ON TOP of that write. An
    // order-consistent merge stays adjudicated out (the top-level rank
    // dictionary approaches corpus-position cardinality, so placing
    // novel ranks BETWEEN corpus ranks IS the re-sort; the binary-search
    // alternative costs log N · log L chained corpus scans per append).
    for (n <- Seq(5000, 20000)) {
      import graft.text.{ExactSubstr, SuffixIndexStore}
      val corpus = synth(spark.range(n)).cache()
      val batch = synth(spark.range(n, n + 500)).cache()
      val probeBatch = synth(spark.range(n + 500, n + 1000)).cache()
      corpus.count(); batch.count(); probeBatch.count()
      val root = java.nio.file.Files.createTempDirectory("incbench-suf").toString
      val t3 = System.nanoTime()
      SuffixIndexStore.bootstrapCommitted(spark, root, corpus, "doc_id",
        prefixLen = 64, windowL = 13)
      val dtRebuild = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      SuffixIndexStore.appendBatchCommitted(spark, root, batch, "doc_id",
        batchMark = Some(1L))
      val dtAppend = (System.nanoTime() - t4) / 1e9
      val st = SuffixIndexStore.read(spark, root).get
      val t5 = System.nanoTime()
      val nProbe = ExactSubstr.batchSpanCoverageVsCorpus(probeBatch,
        "doc_id", L = 13, corpusRounds = st.rounds, tokenDict = st.tokenDict,
        corpusWinCounts = st.windowCounts, pairDicts = st.pairDicts,
        knownMaxRanks = st.maxRanks).count()
      val dtProbe = (System.nanoTime() - t5) / 1e9
      println(f"suffix_store corpus=$n batch=500 rebuild=$dtRebuild%.1f s " +
        f"append=$dtAppend%.1f s probe=$dtProbe%.1f s (probe_rows=$nProbe) " +
        f"rebuild_vs_append=${dtRebuild / dtAppend}%.1fx " +
        f"append_vs_probe=${dtAppend / dtProbe}%.1fx")
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

    // IVF drift + the recluster-vs-append price (the q_ivfdrift story at
    // scale): a standing index appends a DRIFTED batch without refit —
    // the cheap row is assign(batch) + the drift metric (the retrain
    // signal); the expensive row is the full recluster (KMeans refit
    // over the union + reassign everything). The drift metric is what
    // turns the cadence into a cost decision: recluster when
    // batch mean-d2 pulls away from the fit era, not on a timer.
    {
      import graft.similarity.Similarity
      val dim = 32; val nCorpus = 150000; val nBatch = 4000
      val corpus = spark.range(nCorpus).select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), j -> sin(CAST(id * $dim + j AS DOUBLE)))")
          .as("embedding")).cache()
      // drifted batch: the corpus generator plus a constant shift
      val batch = spark.range(nCorpus, nCorpus + nBatch).select(
        col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), j -> sin(CAST(id * $dim + j AS DOUBLE)) + 0.4D)")
          .as("embedding")).cache()
      corpus.count(); batch.count()
      // yesterday's standing index — centroids, assignments AND the
      // fit-era drift row all persist from fit time; none billed to the
      // nightly append
      val centroids = Similarity.ivfCentroids(corpus, nClusters = 16)
        .localCheckpoint()
      val standing = Similarity.ivfAssign(corpus, "vec_id", centroids)
        .localCheckpoint()
      val fitEra = Similarity.ivfDriftEra(corpus, "corpus", "vec_id", centroids)
        .localCheckpoint()
      val meanFit = fitEra.head.getLong(2)
      // the nightly append: assign the batch to the frozen centroids +
      // compute ITS drift row — batch-sized work only
      val t6 = System.nanoTime()
      val appended = standing.select("vec_id")
        .unionByName(Similarity.ivfAssign(batch, "vec_id", centroids)
          .select("vec_id")).count()
      val meanBatch = Similarity.ivfDriftEra(batch, "batch", "vec_id",
        centroids).head.getLong(2)
      val dtAppend = (System.nanoTime() - t6) / 1e9
      // the priced alternative: full recluster (refit over the union +
      // reassign everything) — corpus-sized by construction
      val t7 = System.nanoTime()
      val refit = Similarity.ivfCentroids(corpus.unionByName(batch),
        nClusters = 16)
      val nRefit = Similarity.ivfAssign(corpus.unionByName(batch), "vec_id",
        refit).count()
      val dtRecluster = (System.nanoTime() - t7) / 1e9
      println(f"ivf_drift corpus=$nCorpus batch=$nBatch appended=$appended " +
        f"refit=$nRefit mean_d2_micros_fit=$meanFit " +
        f"mean_d2_micros_batch=$meanBatch " +
        f"drift_ratio=${meanBatch.toDouble / math.max(meanFit, 1L)}%.1fx " +
        f"append+metric=$dtAppend%.1f s recluster=$dtRecluster%.1f s " +
        f"recluster_vs_append=${dtRecluster / dtAppend}%.1fx")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
