package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  // target domain talks about physics; source is mostly cooking with a
  // few physics-like docs mixed in — DSIR should pull those to the top.
  private lazy val target = (1L to 20L)
    .map(i => (i, "quark lepton boson hadron spin quark boson " * 3))
    .toDF("doc_id", "text")
  private lazy val source = ((101L to 140L)
    .map(i => (i, "flour butter sugar oven whisk dough salt yeast " * 3)) ++
    (201L to 210L)
      .map(i => (i, "quark boson spin lepton hadron quark spin boson " * 3)))
    .toDF("doc_id", "text")

  test("importance weights rank target-like source docs above the rest") {
    val ratios = ImportanceSampling.logRatioMicros(target, source)
    val w = ImportanceSampling.importanceWeightsMicros(source, ratios)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_micros")).toMap
    val physics = (201L to 210L).map(w)
    val cooking = (101L to 140L).map(w)
    assert(physics.min > cooking.max)
    assert(physics.forall(_ > 0) && cooking.forall(_ < 0))
  }

  test("gumbel top-k is deterministic per salt and selects the enriched docs") {
    val ratios = ImportanceSampling.logRatioMicros(target, source)
    val w = ImportanceSampling.importanceWeightsMicros(source, ratios)
    def sample(salt: String) = ImportanceSampling.gumbelTopK(w, k = 10, salt = salt)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val a = sample("s0")
    assert(sample("s0") === a)                        // reproducible draw
    assert(a.count(_ >= 201L) === 10)                 // weight gap >> noise here
    // the noise is real: with near-uniform weights the salt changes the draw
    val flat = (1L to 200L).map(i => (i, 0L)).toDF("doc_id", "logw_micros")
    val d0 = ImportanceSampling.gumbelTopK(flat, k = 20, salt = "s0")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val d1 = ImportanceSampling.gumbelTopK(flat, k = 20, salt = "s1")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(d0 !== d1)
  }

  test("weights are partitioning-independent (exact integer sums)") {
    val ratios = ImportanceSampling.logRatioMicros(target, source)
    def w(df: org.apache.spark.sql.DataFrame) =
      ImportanceSampling.importanceWeightsMicros(df, ratios)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_micros")).toMap
    assert(w(source) === w(source.repartition(13)))
  }

  test("unigram NLL scores rare-token documents above common-token ones") {
    val docs = ((1L to 30L).map(i => (i, "common words repeated always here " * 4)) :+
      (99L, "zxqv wkjy pmnt common words gjrl")).toDF("doc_id", "text")
    val out = ImportanceSampling.unigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_nll")).toMap
    assert((1L to 30L).forall(i => out(99L) > out(i)))
    // mean is consistent with the exact integer total
    val row = ImportanceSampling.unigramNll(docs).filter(col("doc_id") === 99L)
      .collect().head
    assert(row.getAs[Double]("mean_nll") ===
      row.getAs[Long]("nll_total_micros").toDouble / row.getAs[Long]("n_tokens") / 1e6)
  }

  test("bigram NLL separates fixed phrases from shuffled ones; counts are exact") {
    // docs 1-20 repeat the fixed phrase; doc 99 has the same unigram mix but
    // includes the corpus-rare transitions alpha->alpha and beta->beta, so
    // conditional (bigram) surprise separates what unigram NLL cannot
    val docs = ((1L to 20L).map(i => (i, "alpha beta alpha beta alpha beta")) :+
      (99L, "beta alpha alpha beta beta alpha")).toDF("doc_id", "text")
    val out = ImportanceSampling.bigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") === 5L)
    assert((1L to 20L).forall(i =>
      out(99L).getAs[Double]("mean_nll") > out(i).getAs[Double]("mean_nll")))
    // single-token and empty docs contribute no row
    val tiny = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val rows = ImportanceSampling.bigramNll(tiny).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
    // partitioning-independent (exact integer totals)
    def totals(df: org.apache.spark.sql.DataFrame) =
      ImportanceSampling.bigramNll(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_total_micros")).toMap
    assert(totals(docs) === totals(docs.repartition(7)))
  }

  test("Kneser-Ney backs off by continuation count: the Francisco effect") {
    // 'francisco' is corpus-frequent but appears after exactly one context
    // ('san'); 'common' is equally frequent but follows many different
    // contexts. Two probe docs pair each with the same fresh context 'zz'
    // (both probe bigrams have c2 = 1 and share ctx/n1l for 'zz'), so the
    // ONLY difference is the continuation count — KN must charge the
    // context-bound token more. Plain interpolation (bigramNll) can't see
    // this: both tokens have identical unigram frequency.
    val contexts = Seq("alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta")
    val docs = ((1L to 8L).map(i => (i, "san francisco")) ++
      contexts.zipWithIndex.map { case (c, i) => (11L + i, s"$c common") } ++
      Seq((98L, "zz francisco"), (99L, "zz common"))).toDF("doc_id", "text")
    val out = ImportanceSampling.kneserNeyNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(98L).getAs[Double]("mean_nll") > out(99L).getAs[Double]("mean_nll"))
    assert(out(98L).getAs[Long]("n_bigrams") === 1L)
    // under plain interpolation the two probes are indistinguishable
    val interp = ImportanceSampling.bigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_total_micros")).toMap
    assert(interp(98L) === interp(99L))
    // docs with < 2 tokens contribute no row; integer totals are
    // partition-order independent
    val tiny = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(ImportanceSampling.kneserNeyNll(tiny).collect()
      .map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
    def totals(df: org.apache.spark.sql.DataFrame) =
      ImportanceSampling.kneserNeyNll(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kn_nll_micros")).toMap
    assert(totals(docs) === totals(docs.repartition(7)))
  }
}
