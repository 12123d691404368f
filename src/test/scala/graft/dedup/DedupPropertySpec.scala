package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalence properties for the exact-join family: across
  * random corpora (varying vocabulary skew, shared-boilerplate blocks,
  * doc lengths) and thresholds, the prefix-filtered joins — capped and
  * uncapped — must equal the brute-force reference exactly. This is the
  * guarantee the Scaladoc proofs claim; the property run covers shapes
  * the hand-built fixtures don't.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocabSize = 4 + rnd.nextInt(8)
    val pool = Vector.tabulate(vocabSize)(i => s"w$i")
    val boiler = Vector.fill(rnd.nextInt(6))(pool(rnd.nextInt(pool.size)))
    (0L until 24L).map { i =>
      val n = 3 + rnd.nextInt(10)
      val body = Vector.fill(n)(pool(rnd.nextInt(pool.size)))
      // some docs lead with the shared boilerplate block; a few are
      // boilerplate-only (the heavy class)
      val words =
        if (i % 7 == 0 && boiler.nonEmpty) boiler
        else if (i % 3 == 0) boiler ++ body
        else body
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("prefixFilterJaccardPairs ≡ exact all-pairs across random corpora, " +
      "thresholds and cap ratios") {
    for (seed <- 1 to 6) {
      val docs = randomCorpus(seed)
      val t = Seq(0.3, 0.5, 0.7)(seed % 3)
      val exact = Dedup.jaccardPairs(docs, "doc_id", minJaccard = t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
      for (ratio <- Seq(0.15, 0.5, 1.0)) {
        val pf = Dedup.prefixFilterJaccardPairs(docs, "doc_id",
          minJaccard = t, maxDfRatio = ratio).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
        assert(pf === exact, s"seed=$seed t=$t ratio=$ratio")
      }
    }
  }

  test("containmentPairs ≡ exact directional scan across random corpora " +
      "and cap ratios") {
    for (seed <- 7 to 12) {
      val docs = randomCorpus(seed)
      val t = Seq(0.5, 0.7, 0.9)(seed % 3)
      val ids = (0L until 24L)
      val allPairs = ids.flatMap(a => ids.filter(_ != a).map(b => (a, b)))
        .toDF("doc_a", "doc_b")
      val exact = Dedup.exactJaccardForPairs(docs, allPairs, "doc_id",
          minJaccard = 0.0)
        .withColumn("containment",
          round(col("inter").cast("double") / col("size_a"), 6))
        .filter(col("containment") >= t)
        .select("doc_a", "doc_b", "containment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment"))).toSet
      for (ratio <- Seq(0.15, 0.5, 1.0)) {
        val cp = Dedup.containmentPairs(docs, "doc_id",
          minContainment = t, maxDfRatio = ratio).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment"))).toSet
        assert(cp === exact, s"seed=$seed t=$t ratio=$ratio")
      }
    }
  }
}
