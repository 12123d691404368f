package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale validation for the banded-MinHash dedup path: synthesize a
  * deterministic corpus with 20 planted near-duplicate pairs, run
  * `jaccardPairsScalable` at increasing corpus sizes, and report wall
  * time + planted recall. The claim under test: runtime grows ~linearly
  * with the corpus (candidates come from banding buckets, never
  * all-pairs) while recall of true near-dups stays 1.0.
  *
  * Usage: runMain graft.DedupScaleBench [n1 n2 ...]   (default 20000 40000)
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(20000, 40000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      // base docs: 60 hash-drawn tokens from a 1000-word vocabulary;
      // planted docs n..n+19 copy docs 0..19 with every 15th token
      // replaced (>= ~0.66 three-gram jaccard vs the original)
      val base = spark.range(n).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(1, 60),
          | j -> concat('t', CAST(abs(xxhash64(id, j)) % 1000 AS STRING))))""".stripMargin)
          .as("text"))
      val planted = spark.range(20).select((col("id") + n).as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(1, 60),
          | j -> CASE WHEN j % 15 = 0 THEN concat('x', CAST(j AS STRING))
          |   ELSE concat('t', CAST(abs(xxhash64(id, j)) % 1000 AS STRING)) END))""".stripMargin)
          .as("text"))
      val docs = base.unionByName(planted).cache()
      docs.count()
      val t0 = System.nanoTime()
      val pairs = Dedup.jaccardPairsScalable(docs, "doc_id",
        n = 3, minJaccard = 0.5, numHashTables = 8).cache()
      val total = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val plantedFound = pairs.filter(col("doc_b") === col("doc_a") + n).count()
      println(f"docs=${n + 20} pairs=$total planted_recall=${plantedFound / 20.0}%.2f sec=$dt%.1f")
      spark.catalog.clearCache()

      // clusters over a synthetic pair graph scaled with the corpus:
      // n/100 chains of length 10 (diameter 9 — worst case for min-label
      // propagation at this component size). Validates that the iterative
      // join path stays linear in edges with a fixed round count.
      val chains = n / 100
      val edges = spark.range(chains * 9).select(
        ((col("id") / 9).cast("long") * 10 + (col("id") % 9)).as("doc_a"),
        ((col("id") / 9).cast("long") * 10 + (col("id") % 9) + 1).as("doc_b"))
      val t1 = System.nanoTime()
      val labels = Dedup.dedupClusters(edges)
      val nodes = labels.count()
      val comps = labels.select("cluster_id").distinct().count()
      val dtc = (System.nanoTime() - t1) / 1e9
      println(f"cluster_nodes=$nodes components=$comps (expect ${chains}) sec=$dtc%.1f")
      spark.catalog.clearCache()

      // bloom incremental dedup: a batch of n/4 docs (10% re-crawls of the
      // history) deduped against the n-doc history two ways. The claim:
      // the two-phase path (bounded filter artifact + exact verify of the
      // flagged slice only) returns the identical row set while the exact
      // join side touches ~dups + fpp·batch rows instead of the whole
      // batch; the filter build is a one-time cost that amortizes over
      // every subsequent batch.
      val batchN = n / 4
      val batch = spark.range(batchN).select((col("id") + 1000000L).as("doc_id"),
        expr(s"""CASE WHEN id % 10 = 0
          | THEN concat_ws(' ', transform(sequence(1, 60),
          |   j -> concat('t', CAST(abs(xxhash64(CAST(id / 10 AS BIGINT), j)) % 1000 AS STRING))))
          | ELSE concat_ws(' ', transform(sequence(1, 60),
          |   j -> concat('n', CAST(abs(xxhash64(id + 7777, j)) % 1000 AS STRING)))) END""".stripMargin)
          .as("text")).cache()
      batch.count()
      val tf0 = System.nanoTime()
      val filt = graft.dedup.BloomDedup.buildFilter(base, expectedItems = n.toLong, fpp = 0.01)
      val dtFilter = (System.nanoTime() - tf0) / 1e9
      val tb0 = System.nanoTime()
      val kept2p = graft.dedup.BloomDedup.newDocuments(batch, base, filt).count()
      val dt2p = (System.nanoTime() - tb0) / 1e9
      val tp0 = System.nanoTime()
      val keptPlain = batch
        .withColumn("_fp", graft.dedup.BloomDedup.fingerprint(col("text")))
        .join(base.select(graft.dedup.BloomDedup.fingerprint(col("text")).as("_fp")).distinct(),
          Seq("_fp"), "left_anti").count()
      val dtPlain = (System.nanoTime() - tp0) / 1e9
      val flagged = graft.dedup.BloomDedup.probe(batch, filt)
        .filter(col("maybe_dup")).count()
      println(f"bloom: batch=$batchN flagged=$flagged kept=$kept2p (plain=$keptPlain, equal=${kept2p == keptPlain}) " +
        f"filter_build=$dtFilter%.1fs two_phase=$dt2p%.1fs plain_join=$dtPlain%.1fs " +
        f"filter_kb=${filt.length / 1024}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
