package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityTrainingSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: even ids draw from an "editorial" vocabulary, odd ids
  // from a disjoint "spam" vocabulary. Token identity carries the whole
  // signal; surface statistics (length, diversity) are engineered to be
  // similar across classes so the weak labels are genuinely noisy.
  private val goodVocab = Vector("harbor", "granite", "meadow", "lantern",
    "copper", "orchard", "timber", "saddle", "willow", "ember", "garnet",
    "thicket", "anchor", "bramble", "cinder", "drift", "fenn", "grove")
  private val badVocab = Vector("clickz", "freebie", "winnow", "promo",
    "blastx", "dealio", "spammy", "offerz", "buynow", "cheapo", "crypto",
    "jackpt", "luckyx", "bonusz", "scamlt", "pumpit", "shill", "grift")

  private def corpus(n: Int) = (0L until n.toLong).map { i =>
    val vocab = if (i % 2 == 0) goodVocab else badVocab
    val rnd = new scala.util.Random(i)
    val words = Vector.fill(30)(vocab(rnd.nextInt(vocab.size)))
    (i, words.mkString(" "), if (i % 2 == 0) 1.0 else 0.0)
  }.toDF("doc_id", "text", "true_label")

  test("trained weights separate planted classes that the weak-label " +
      "heuristics cannot, and beat the hash stand-in by a wide margin") {
    val docs = corpus(300)
    // weak labels: the TRUE class with a deterministic 20% flip — the
    // noisy supervision a real pipeline gets from heuristics
    val weak = docs.select(col("doc_id"),
      when(col("doc_id") % 10 < 2, lit(1.0) - col("true_label"))
        .otherwise(col("true_label")).as("label"))
    val nBuckets = 4096
    val (weights, bias) = QualityTraining.trainQualityWeights(
      docs, "doc_id", weak, nBuckets, maxIter = 50, regParam = 0.01)

    def accuracy(w: org.apache.spark.sql.DataFrame, b: Long, thr: Long) =
      TextAnalysis.hashedQualityScore(docs, "doc_id", w, nBuckets,
          biasMicros = b, thresholdMicros = thr)
        .join(docs.select("doc_id", "true_label"), Seq("doc_id"))
        .select(avg((col("keep").cast("double") === col("true_label"))
          .cast("double")).as("acc"))
        .head.getDouble(0)

    val trained = accuracy(weights, bias, 0L)
    // the deterministic stand-in table scores at its documented operating
    // point (bias 0, threshold at the pseudo-weight midpoint 500000 —
    // the q_qualclf registration's setting)
    val standin = accuracy(TextAnalysis.hashWeightTable(spark, nBuckets),
      0L, 500000L)
    // token identity is fully separable: the trained model should be
    // near-perfect despite 20% label noise; the stand-in is chance-level
    assert(trained >= 0.95, s"trained accuracy $trained")
    assert(trained >= standin + 0.2,
      s"trained $trained should clearly beat stand-in $standin")
  }

  test("zipfSlope recovers the planted exponent on an exact power-law corpus") {
    // token t_i planted with frequency floor(6000 / i^1.0): slope ≈ -1
    val words = (1 to 100).flatMap(i => Seq.fill(6000 / i)(f"t$i%03d"))
    val docs = words.grouped(500).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(docs, topN = 100).collect().head
    assert(r.getAs[Long]("n_fit") === 100L)
    val slope = r.getAs[Double]("zipf_slope")
    // floor() quantization of counts biases the tail slightly steep;
    // the fit must still land in a tight band around -1
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    // intercept ≈ ln(6000) ≈ 8.7 in natural-log units
    val icpt = r.getAs[Double]("zipf_intercept")
    assert(icpt > 8.0 && icpt < 9.3, s"intercept $icpt")
    // a uniform corpus (all counts equal) fits slope ≈ 0
    val flatDocs = Seq((0L, (1 to 50).map(i => s"u$i u$i u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val flat = TextAnalysis.zipfSlope(flatDocs, topN = 50).collect().head
    assert(math.abs(flat.getAs[Double]("zipf_slope")) < 1e-6)
  }

  test("readability: hand-computed Flesch on known sentences; polysyllabic " +
      "prose scores below simple prose") {
    val docs = Seq(
      (0L, "the cat sat on the mat."),                  // 6 words, 1 sent, 6 syl
      (1L, "extraordinary considerations necessitate comprehensive reevaluation."),
      (2L, "no terminal punctuation here at all"))      // sentence floor = 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"),
        r.getAs[Double]("flesch")))).toMap
    // doc 0: each word one vowel group ("the"=1, "cat"=1, ... "mat."=1)
    assert(out(0L)._1 === 6L && out(0L)._2 === 1L && out(0L)._3 === 6L)
    // 206.835 - 1.015*6 - 84.6*1 = 116.145
    assert(math.abs(out(0L)._4 - 116.145) < 1e-6)
    // the polysyllabic doc scores far lower
    assert(out(1L)._4 < out(0L)._4 - 50)
    // missing punctuation clamps to one sentence, not a division by zero
    assert(out(2L)._2 === 1L)
  }

  test("weakQualityLabels flags repetitive and degenerate-length docs") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over a lazy dog tonight"), // diverse
      (1L, "spam spam spam spam spam spam spam spam"),           // repetitive
      (2L, "a b c d e f g h i j"),                               // mean len 1
      (3L, "honorificabilitudinitatibus antidisestablishmentarianism " +
        "floccinaucinihilipilification pseudopseudohypoparathyroidism " +
        "supercalifragilisticexpialidocious pneumonoultramicroscopicsilico " +
        "hippopotomonstrosesquippedaliophobia thyroparathyroidectomized " +
        "dichlorodifluoromethane electroencephalographically"))  // mean len > 9
      .toDF("doc_id", "text")
    val out = QualityTraining.weakQualityLabels(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(0L -> 1.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("exported weights plug into the scoring path: keep == (margin >= 0) " +
      "at the model's own decision boundary") {
    val docs = corpus(100)
    val weak = docs.select(col("doc_id"), col("true_label").as("label"))
    val (weights, bias) = QualityTraining.trainQualityWeights(
      docs, "doc_id", weak, 1024, maxIter = 30)
    val scored = TextAnalysis.hashedQualityScore(docs, "doc_id", weights,
      1024, biasMicros = bias, thresholdMicros = 0L)
    // keep must be exactly score_micros >= 0 (the 0.5-probability line)
    assert(scored.filter(col("keep") =!= (col("score_micros") >= 0L)).count() === 0L)
    // and with clean labels the fit separates the corpus perfectly
    val acc = scored.join(docs, Seq("doc_id"))
      .filter(col("keep").cast("double") === col("true_label")).count()
    assert(acc === 100L)
  }
}
