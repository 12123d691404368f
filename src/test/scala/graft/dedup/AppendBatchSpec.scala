package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental maintenance of the standing pair graph + clustering
  * (PairGraph.appendBatch): the re-clustering input must scale with the
  * BATCH (only touched components re-enter label propagation), and the
  * maintained result must equal a full rebuild over corpus ∪ batch —
  * including the hard case where one batch doc BRIDGES two standing
  * clusters.
  */
class AppendBatchSpec extends SparkSpec {
  import spark.implicits._

  // Three disjoint exact-duplicate families + a singleton. Exact dups
  // (jaccard 1.0) cannot be missed by banding: identical shingle sets
  // give identical min-signatures in every table.
  private val tA = "alpha one two three four five six seven eight nine"
  private val tB = "bravo uno dos tres cuatro cinco seis siete ocho nueve"
  private val tC = "charlie un deux trois quatre cinq six7 sept huit neuf"
  private lazy val corpus = Seq(
    (1L, tA), (2L, tA),
    (11L, tB), (12L, tB),
    (21L, tC), (22L, tC),
    (31L, "singleton text with nothing shared anywhere else at all ok")
  ).toDF("doc_id", "text")

  private lazy val standingPairs = Dedup.jaccardPairsScalable(
    corpus, "doc_id", n = 3, minJaccard = 0.5, numHashTables = 8)
    .select("doc_a", "doc_b", "jaccard").localCheckpoint()
  private lazy val standingClusters =
    Dedup.dedupClusters(standingPairs).localCheckpoint()

  private def clustersOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("touched subgraph carries ONLY the clusters the batch touches") {
    // batch doc 41 duplicates family B; 42 is novel
    val batch = Seq((40L, tB), (42L, "entirely novel crawl content right here")
      ).toDF("doc_id", "text")
    val edges = PairGraph.batchEdges(corpus, batch, "doc_id")
    // 40 pairs with 11 and 12 only
    assert(edges.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((11L, 40L), (12L, 40L)))
    val sub = PairGraph.touchedSubgraph(standingPairs, standingClusters, edges)
    // only family B's standing pair re-enters clustering — families A and
    // C (and the singleton) are not re-read
    assert(sub.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((11L, 12L)))
  }

  test("appendBatch == full rebuild; untouched clusters carried verbatim") {
    val batch = Seq((40L, tB), (42L, "entirely novel crawl content right here")
      ).toDF("doc_id", "text")
    val (pairs, clusters) = PairGraph.appendBatch(
      standingPairs, standingClusters, corpus, batch, "doc_id")
    val full = corpus.unionByName(batch)
    val rebuiltPairs = Dedup.jaccardPairsScalable(full, "doc_id",
      n = 3, minJaccard = 0.5, numHashTables = 8)
      .select("doc_a", "doc_b", "jaccard")
    assert(pairs.collect().map(_.toSeq).toSet ===
      rebuiltPairs.collect().map(_.toSeq).toSet)
    val got = clustersOf(clusters)
    assert(got === clustersOf(Dedup.dedupClusters(rebuiltPairs)))
    // family B extended, min label kept; A and C labels untouched
    assert(got === Map(1L -> 1L, 2L -> 1L, 11L -> 11L, 12L -> 11L,
      40L -> 11L, 21L -> 21L, 22L -> 21L))
  }

  test("a bridging batch doc merges two standing clusters, min label wins") {
    // w4..w15 overlaps both tD (w1..w12) and tE (w7..w18) at jaccard
    // 7/13 ≈ 0.538 >= 0.5, while j(tD, tE) = 4/16 = 0.25 keeps the two
    // standing families apart
    val w = (1 to 18).map(i => s"w$i")
    val tD = w.slice(0, 12).mkString(" ")
    val tE = w.slice(6, 18).mkString(" ")
    val bridge = w.slice(3, 15).mkString(" ")
    val corpus2 = Seq((1L, tD), (2L, tD), (11L, tE), (12L, tE))
      .toDF("doc_id", "text")
    val sp = Dedup.jaccardPairsScalable(corpus2, "doc_id",
      n = 3, minJaccard = 0.5, numHashTables = 8)
      .select("doc_a", "doc_b", "jaccard").localCheckpoint()
    val sc = Dedup.dedupClusters(sp).localCheckpoint()
    assert(clustersOf(sc) === Map(1L -> 1L, 2L -> 1L, 11L -> 11L, 12L -> 11L))
    val batch = Seq((40L, bridge)).toDF("doc_id", "text")
    val (pairs, clusters) = PairGraph.appendBatch(sp, sc, corpus2, batch, "doc_id")
    val got = clustersOf(clusters)
    // both standing components re-solve into ONE, labeled by min id 1
    assert(got === Map(1L -> 1L, 2L -> 1L, 11L -> 1L, 12L -> 1L, 40L -> 1L))
    // and equals the full rebuild on the unioned corpus
    val rebuilt = Dedup.dedupClusters(Dedup.jaccardPairsScalable(
      corpus2.unionByName(batch), "doc_id",
      n = 3, minJaccard = 0.5, numHashTables = 8))
    assert(got === clustersOf(rebuilt))
    // exactly the bridge's edges (it matches both copies of each family)
    assert(pairs.count() === sp.count() + 4)
  }

  test("appendShingleStats merge equals a full rebuild over the union") {
    val batch = Seq((40L, tB), (42L, "entirely novel crawl content right here")
      ).toDF("doc_id", "text")
    val standing = Dedup.shingles(corpus, "doc_id", n = 3)
      .groupBy("shingle")
      .agg(count(lit(1)).as("_df"), min("doc_id").as("first_doc"))
    val merged = PairGraph.appendShingleStats(standing, batch, "doc_id", n = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rebuilt = Dedup.shingles(corpus.unionByName(batch), "doc_id", n = 3)
      .groupBy("shingle")
      .agg(count(lit(1)).as("_df"), min("doc_id").as("first_doc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged === rebuilt)
    // the merge really did add: tB's shingles gained df, novel ones appeared
    val tBShingle = tB.split(" ").slice(0, 3).mkString(" ")
    assert(merged(tBShingle)._1 === 3L) // docs 11, 12, 40
    assert(merged(tBShingle)._2 === 11L) // first owner keeps the corpus min
  }

  test("appendInvertedIndex merge equals a full rebuild; the df cap " +
      "re-applies against the GROWN corpus size") {
    import graft.text.TextAnalysis
    val batch = Seq((40L, tB), (42L, "entirely novel crawl content right here")
      ).toDF("doc_id", "text")
    val standing = TextAnalysis.invertedIndexStats(corpus, "doc_id")
    val merged = TextAnalysis.appendInvertedIndex(standing, batch, "doc_id")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val rebuilt = TextAnalysis.invertedIndexStats(
      corpus.unionByName(batch), "doc_id")
    assert(m(merged) === m(rebuilt))
    // tB's tokens gained doc 40, postings stay sorted
    assert(m(merged)("bravo") === ((3L, Seq(11L, 12L, 40L))))
    // the read-time cap uses the UNION's size: df 3 of 9 docs passes a
    // 0.4 ratio (3 <= 3.6) that the 7-doc corpus alone would fail (2.8)
    val capped = TextAnalysis.applyDfCap(merged,
      corpus.unionByName(batch).agg(count(lit(1)).as("_n")), 0.4)
    assert(m(capped).contains("bravo"))
  }

  test("replaying a batch whose docs already sit in the corpus cannot " +
      "duplicate pair rows or inject self-loops") {
    // the crash-replay shape: the corpus append landed, the watermark
    // advance did not, and a caller without the batchMark guard re-runs
    // the SAME batch against a corpus that already contains it. Raw
    // batchEdges then matches every batch doc against its own corpus
    // copy (self-loops at jaccard 1.0) and re-derives every standing
    // edge; the hardened appendBatch must keep the pair table
    // row-identical to the pre-replay standing state.
    val batch = Seq((40L, tB), (42L, "entirely novel crawl content right here")
      ).toDF("doc_id", "text")
    val full = corpus.unionByName(batch)
    val sp = Dedup.jaccardPairsScalable(full, "doc_id",
      n = 3, minJaccard = 0.5, numHashTables = 8)
      .select("doc_a", "doc_b", "jaccard").localCheckpoint()
    val sc = Dedup.dedupClusters(sp).localCheckpoint()
    // the raw edge generator really does produce the poison rows here
    val raw = PairGraph.batchEdges(full, batch, "doc_id")
    assert(raw.filter(col("doc_a") === col("doc_b")).count() > 0L,
      "precondition: the replay shape generates self-loops")
    val (pairs, clusters) = PairGraph.appendBatch(sp, sc, full, batch, "doc_id")
    assert(pairs.collect().map(_.toSeq).toSet ===
      sp.collect().map(_.toSeq).toSet)
    assert(pairs.count() === sp.count(), "no duplicated edge rows")
    assert(clustersOf(clusters) === clustersOf(sc))
  }

  test("an edgeless batch changes nothing and re-clusters nothing") {
    val batch = Seq((50L, "totally fresh unseen material zzz qqq xxx yyy www vvv")
      ).toDF("doc_id", "text")
    val edges = PairGraph.batchEdges(corpus, batch, "doc_id")
    assert(edges.count() === 0L)
    assert(PairGraph.touchedSubgraph(standingPairs, standingClusters, edges)
      .count() === 0L)
    val (pairs, clusters) = PairGraph.appendBatch(
      standingPairs, standingClusters, corpus, batch, "doc_id")
    assert(pairs.count() === standingPairs.count())
    assert(clustersOf(clusters) === clustersOf(standingClusters))
  }
}
