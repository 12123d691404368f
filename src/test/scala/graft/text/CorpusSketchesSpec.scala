package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSketchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed vocabulary: token_i appears ~ 500/i times (zipf-ish), two sources
  private lazy val docs = {
    val words = (1 to 60).flatMap(i => Seq.fill(math.max(500 / i, 1))(s"tok$i"))
    val rnd = new scala.util.Random(3)
    val shuffled = rnd.shuffle(words)
    shuffled.grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, if (i % 2 == 0) "a" else "b", g.mkString(" ")) }
      .toSeq.toDF("doc_id", "source", "text")
  }

  test("approx_top_k is exact while the vocabulary fits the tracked budget") {
    val approx = CorpusSketches.topTokensApprox(docs, k = 10)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap
    val exact = TextAnalysis.withTokens(docs)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token")).limit(10)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("count")).toMap
    // 60 distinct tokens << 10000 tracked: the sketch never evicts, counts exact
    assert(approx === exact)
  }

  test("HLL distinct estimates land within the documented error envelope") {
    val est = CorpusSketches.distinctTokensByGroup(docs, "source")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("est_distinct_tokens")).toMap
    val exact = TextAnalysis.withTokens(docs)
      .select(col("source"), explode(col("tokens")).as("token"))
      .groupBy("source").agg(countDistinct(col("token")).as("d"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (src, d) =>
      assert(math.abs(est(src) - d).toDouble / d < 0.05,
        s"source $src: est ${est(src)} vs exact $d")
    }
  }

  test("materialized HLL sketches merge to the global estimate") {
    val sk = CorpusSketches.distinctTokenSketches(docs, "source")
      .withColumn("source", lit("all")) // collapse groups -> union all sketches
    val merged = CorpusSketches.mergeDistinctSketches(sk, "source")
      .collect().head.getAs[Long]("est_distinct_tokens")
    val exactAll = TextAnalysis.withTokens(docs)
      .select(explode(col("tokens")).as("token"))
      .agg(countDistinct(col("token"))).collect().head.getLong(0)
    assert(math.abs(merged - exactAll).toDouble / exactAll < 0.05)
  }
}
