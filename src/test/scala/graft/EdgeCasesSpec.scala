package graft

import org.apache.spark.sql.functions._

/** Degenerate-input hardening: operators must return empty/identity
  * results on empty or single-row corpora, not throw — an orchestrated
  * pipeline hits empty partitions and filtered-to-nothing inputs daily.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc = Seq((1L, "only one document here")).toDF("doc_id", "text")

  test("dedup pipelines return empty on empty and single-doc corpora") {
    import graft.dedup.Dedup
    assert(Dedup.jaccardPairsScalable(noDocs, "doc_id").count() === 0)
    assert(Dedup.jaccardPairsScalable(oneDoc, "doc_id").count() === 0)
    assert(Dedup.simHashPairs(noDocs, "doc_id").count() === 0)
    assert(Dedup.exactStats(oneDoc).head().getAs[Long]("duplicate_rows") === 0L)
  }

  test("winnowing and collocations handle empty and too-short input") {
    import graft.text.TextAnalysis
    assert(TextAnalysis.winnowFingerprints(noDocs, "doc_id").count() === 0)
    assert(TextAnalysis.winnowFingerprints(Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id")
      .count() === 0) // below k tokens -> no k-grams -> no fingerprints
    assert(TextAnalysis.collocations(noDocs).count() === 0)
  }

  test("as-of join with an empty right side keeps every left row, all-null matches") {
    import graft.operators.AsOfJoin
    val left = Seq(("a", 1L, "x")).toDF("k", "t", "id")
    val right = Seq.empty[(String, Long, Double)].toDF("k", "t", "v")
    val out = AsOfJoin.asOfBackward(left, right, "k", "t").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_ts")))
  }

  test("ANN query-set variants return empty for an empty query set") {
    import graft.similarity.Similarity
    val emb = (0L until 10L).map(i => (i, Seq.fill(8)(i.toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val noIds = Seq.empty[Long].toDF("vec_id")
    assert(Similarity.lshTopKFor(emb, "vec_id", noIds, k = 3).count() === 0)
    assert(Similarity.ivfTopKFor(emb, "vec_id", noIds, k = 3, nClusters = 2).count() === 0)
  }

  test("sampling operators are identity-at-fraction-1 and empty-safe") {
    import graft.gold.Sampling
    val docs = Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
    assert(Sampling.stratifiedSample(docs, "lang", "id", Map.empty).count() === 2)
    assert(Sampling.stratifiedSample(noDocs.toDF("id", "lang"), "lang", "id",
      Map("en" -> 0.5)).count() === 0)
    assert(Sampling.rebalanceByCount(docs, "lang", "id", 10).count() === 2)
  }

  test("packing, sharding, DSIR, and semdedup are empty- and tiny-input safe") {
    import graft.text.{CorpusCuration, ImportanceSampling}
    import graft.dedup.Dedup
    val noW = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(CorpusCuration.packSequences(noW, capacity = 128L, weightCol = "n_tokens")
      .count() === 0)
    // one doc larger than the capacity straddles ceil(w/cap) sequences
    val big = Seq((1L, 299L)).toDF("doc_id", "n_tokens")
    assert(CorpusCuration.packSequences(big, capacity = 100L, weightCol = "n_tokens")
      .count() === 3)
    assert(CorpusCuration.shuffleShards(noDocs, nShards = 4).count() === 0)
    assert(CorpusCuration.shuffleShards(oneDoc, nShards = 4).count() === 1)
    assert(ImportanceSampling.unigramNll(noDocs).count() === 0)
    assert(ImportanceSampling.gumbelTopK(
      Seq((1L, 5L)).toDF("doc_id", "logw_micros"), k = 10, salt = "s").count() === 1)
    val noVec = Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
    assert(Dedup.semDedup(noVec, tau = 0.9).count() === 0)
    val oneVec = Seq((1L, 1, Array(1f, 0f))).toDF("vec_id", "label", "embedding")
    assert(Dedup.semDedup(oneVec, tau = 0.9).count() === 1)
  }

  test("bloom dedup against an empty history keeps the whole batch") {
    import graft.dedup.BloomDedup
    val f = BloomDedup.buildFilter(noDocs, expectedItems = 100)
    assert(BloomDedup.newDocuments(oneDoc, noDocs, f).count() === 1)
    assert(BloomDedup.newDocuments(noDocs, noDocs, f).count() === 0)
  }

  test("gap fill over an empty metric still spans the bounds frame with zeros") {
    import graft.operators.Windows
    val bounds = Seq(("2024-01-01 09:00:00", 1.0), ("2024-01-03 09:00:00", 1.0))
      .toDF("ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val emptyMetric = bounds.filter(lit(false))
    val out = Windows.gapFillDaily(emptyMetric, bounds, "ts", "value")
    assert(out.count() === 3)
    assert(out.agg(sum("n_events")).head().getLong(0) === 0L)
  }

  test("retrieval, k-core, overlap and weighted sampling are empty- and " +
      "missing-input safe") {
    import graft.similarity.Retrieval
    import graft.graph.Graph
    import graft.operators.RangeJoin
    import graft.text.CorpusCuration
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // MMR with no corpus (and hence no query row) returns an empty frame
    assert(Retrieval.mmr(emptyEmb, "vec_id", 0L, k = 3, candPool = 5).count() === 0L)
    // MMR with a query id absent from the corpus: no relevance scores exist
    val emb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    assert(Retrieval.mmr(emb, "vec_id", 99L, k = 2, candPool = 5).count() === 0L)
    // rank fusion of lists that share no keys: every key once, n_lists = 1
    val f = Retrieval.rrfFuse(Seq(
      Seq(("a", 1L)).toDF("k", "rank"), Seq(("b", 1L)).toDF("k", "rank")), "k")
    assert(f.count() === 2L &&
      f.agg(max("n_lists")).head.getLong(0) === 1L)
    // k-core of an empty / all-self-loop edge list is empty
    assert(Graph.kCore(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), 2).count() === 0L)
    assert(Graph.kCore(Seq((7L, 7L)).toDF("doc_a", "doc_b"), 1).count() === 0L)
    // overlap join with an empty side is empty, not an error
    val iv = Seq((1L, 0L, 10L)).toDF("l_id", "l_lo", "l_hi")
    assert(RangeJoin.intervalOverlap(iv, iv.filter(lit(false))
        .toDF("r_id", "r_lo", "r_hi"), Seq.empty,
      "l_lo", "l_hi", "r_lo", "r_hi", c => c, 10L).count() === 0L)
    // weighted sample where every row is mass-less is empty
    val docs = Seq((1L, "en", 0L), (2L, "en", -3L)).toDF("doc_id", "lang", "n_chars")
    assert(CorpusCuration.weightedStratumSample(docs, "lang", 3, "n_chars")
      .count() === 0L)
    // leakage-safe split with NO pairs: every doc a singleton, still split
    import graft.dedup.Dedup
    val solo = Dedup.leakageSafeSplit(
      (1L to 40L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), "doc_id")
    assert(solo.count() === 40L)
    assert(solo.select("data_split").distinct().count() >= 2L)
    // cluster-free keepRepresentatives keeps everything
    assert(Dedup.keepRepresentatives(
      (1L to 5L).toDF("doc_id").withColumn("q", lit(1L)),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), "doc_id", "q")
      .filter(col("is_kept")).count() === 5L)
    // hazard over censor-only input: no steps, like KM
    assert(graft.gold.Survival.nelsonAalen(
      Seq((1L, 0), (2L, 0)).toDF("dur", "ev"), "dur", "ev").count() === 0L)
  }
}
