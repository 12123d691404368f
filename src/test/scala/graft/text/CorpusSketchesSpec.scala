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

  test("Count-Min estimates never undercount and hit exact counts at ample width") {
    val toks = TextAnalysis.withTokens(docs)
      .select(explode(col("tokens")).as("token"))
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("count")).toMap
    val probes = exact.keys.toSeq.toDF("token")
    // tight sketch: collisions certain (60 tokens, width 16) -> est >= exact
    val tight = CorpusSketches.cmsEstimate(
      CorpusSketches.cmsCells(toks, "token", depth = 3, width = 16),
      probes, "token", depth = 3, width = 16)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
    exact.foreach { case (t, c) =>
      assert(tight(t) >= c, s"CMS undercounted $t: ${tight(t)} < $c")
    }
    // CM error bound: est <= exact + 2N/width must hold for SOME of the
    // depth rows whp; with depth 3 the min is inside the bound here
    val n = exact.values.sum
    exact.foreach { case (t, c) =>
      assert(tight(t) <= c + 2 * n / 16, s"CMS blew the error bound on $t")
    }
    // ample width: no collisions -> estimates are exactly the counts
    val wide = CorpusSketches.cmsEstimate(
      CorpusSketches.cmsCells(toks, "token", depth = 4, width = 65536),
      probes, "token", depth = 4, width = 65536)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
    assert(wide === exact)
    // a never-seen probe estimates 0 at ample width (absent cells = 0)
    val ghost = CorpusSketches.cmsEstimate(
      CorpusSketches.cmsCells(toks, "token", depth = 4, width = 65536),
      Seq("never-seen-token").toDF("token"), "token", depth = 4, width = 65536)
      .collect().head.getAs[Long]("est")
    assert(ghost === 0L)
  }

  test("Count-Min cell tables merge cellwise: sketch(A) + sketch(B) = sketch(A u B)") {
    val toks = TextAnalysis.withTokens(docs)
      .select(col("source"), explode(col("tokens")).as("token"))
    def cells(src: String) = CorpusSketches.cmsCells(
      toks.filter(col("source") === src).select("token"), "token",
      depth = 3, width = 64)
    val merged = CorpusSketches.cmsMerge(cells("a"), cells("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    val whole = CorpusSketches.cmsCells(toks.select("token"), "token",
      depth = 3, width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(merged === whole)
    // partitioning never changes a cell (exact integer counts)
    val repart = CorpusSketches.cmsCells(
      toks.select("token").repartition(7), "token", depth = 3, width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(repart === whole)
  }

  test("relational HLL: raw estimate lands in the error envelope, registers max-merge") {
    // raw-regime fixture: 5000/3000 distinct items per group (n >> 2.5m,
    // where the omitted linear-counting correction would not kick in)
    val items = ((1 to 5000).map(i => ("a", s"item$i")) ++
      (2001 to 5000).map(i => ("b", s"item$i"))).toDF("grp", "item")
    val est = CorpusSketches.hllEstimate(
      CorpusSketches.hllRegisters(items, "grp", "item"), "grp")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("est_distinct")).toMap
    // m=256 -> relative standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est("a") - 5000) / 5000.0 < 0.20, s"a: ${est("a")}")
    assert(math.abs(est("b") - 3000) / 3000.0 < 0.20, s"b: ${est("b")}")
    // merge: registers(A) max registers(B) == registers(A u B), exactly
    def regs(g: String) = CorpusSketches.hllRegisters(
      items.filter(col("grp") === g).withColumn("grp", lit("all")), "grp", "item")
    val merged = CorpusSketches.hllMergeRegisters(regs("a"), regs("b"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("rho")).toMap
    val whole = CorpusSketches.hllRegisters(
      items.withColumn("grp", lit("all")).select("grp", "item").distinct(), "grp", "item")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("rho")).toMap
    assert(merged === whole)
    // estimates are insensitive to duplication (distinct-count semantics)
    val dup = CorpusSketches.hllEstimate(
      CorpusSketches.hllRegisters(items.union(items).repartition(7), "grp", "item"), "grp")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("est_distinct")).toMap
    assert(dup === est)
  }

  test("CM inner product overestimates join size, exactly at ample width") {
    // keys 1..50 on side A (key k appears k times), 1..30 unique on side B:
    // exact |A join B| = sum_{k=1..30} k = 465
    val a = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 30).map(_.toLong).toDF("k")
    def est(width: Int) = CorpusSketches.cmsJoinSize(
      CorpusSketches.cmsCells(a, "k", depth = 3, width = width),
      CorpusSketches.cmsCells(b, "k", depth = 3, width = width))
      .collect().head.getAs[Long]("est_join_size")
    assert(est(65536) === 465L)          // no collisions: exact
    assert(est(16) >= 465L)              // collisions only ever add
  }

  test("log histogram quantiles: bucket-bounded error, exact merge, rank edges") {
    // group a: 1..1000 (p50 exact = 500, inside bucket [512,1024) boundary
    // cases around it); group b: constant 8s
    val vals = ((1 to 1000).map(i => ("a", i.toLong)) ++
      Seq.fill(10)(("b", 8L))).toDF("grp", "v")
    val hist = CorpusSketches.logHistogram(vals, "grp", "v")
    val est = CorpusSketches.logHistogramQuantiles(hist, "grp", Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Double]("q")) -> r.getAs[Double]("est")).toMap
    // exactly one estimate per (group, q)
    assert(est.size === 6)
    // bucket-width guarantee: est within 2x of the exact percentile
    val exact = Map(("a", 0.5) -> 500.0, ("a", 0.9) -> 900.0, ("a", 0.99) -> 990.0,
      ("b", 0.5) -> 8.0, ("b", 0.9) -> 8.0, ("b", 0.99) -> 8.0)
    exact.foreach { case (k, x) =>
      assert(est(k) >= x / 2 && est(k) <= x * 2, s"$k: ${est(k)} vs exact $x")
    }
    // cellwise merge == whole-corpus histogram
    def h(g: String) = CorpusSketches.logHistogram(
      vals.filter(col("grp") === g).withColumn("grp", lit("all")), "grp", "v")
    val merged = h("a").unionByName(h("b")).groupBy("grp", "bucket")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    val whole = CorpusSketches.logHistogram(
      vals.withColumn("grp", lit("all")), "grp", "v")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    assert(merged === whole)
    // zero and negative values collapse into bucket 0 and estimate 0
    val z = Seq(("z", 0L), ("z", -5L), ("z", 3L)).toDF("grp", "v")
    val zq = CorpusSketches.logHistogramQuantiles(
      CorpusSketches.logHistogram(z, "grp", "v"), "grp", Seq(0.5))
      .collect().head.getAs[Double]("est")
    assert(zq === 0.0) // rank 2 of (0, 0, 3) sits in bucket 0
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
