package graft.text

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Training for the hashed linear quality classifier — the step that turns
  * [[TextAnalysis.hashedQualityScore]] from "scoring machinery with a
  * stand-in weight table" into a real trained filter (the CCNet/GPT-3
  * quality-filter recipe: train a linear model to tell a trusted corpus
  * from the raw crawl, then score everything; cf. the reference's trained
  * model pipeline, sagemaker/training/train.py:106-156).
  *
  * Two pieces:
  *  - [[weakQualityLabels]]: deterministic weak supervision from surface
  *    statistics (lexical diversity + mean token length), standing in for
  *    a trusted-vs-crawl label. Noisy by construction — linear training
  *    over hashed token features tolerates label noise because the signal
  *    it learns lives on TOKEN IDENTITY, which the heuristics never see.
  *  - [[trainQualityWeights]]: spark.ml logistic regression over the SAME
  *    md5-hashed L1-normalized bucket features that
  *    [[TextAnalysis.hashedQualityScore]] scores with
  *    (score = bias + Σ_b x_b·w_b, x_b = count_b/n_tokens), so exported
  *    integer-micros coefficients plug straight into the scoring path:
  *    keep ⇔ score_micros ≥ 0 reproduces the model's 0.5-probability
  *    decision boundary.
  *
  * Scale shape: feature building is the scoring path's explode + one
  * (key, bucket) count + one per-doc assemble; the model is bounded by
  * nBuckets (model-sized), the training aggregation is spark.ml's
  * distributed LBFGS. The exported table is (bucket, w_micros), sparse —
  * exactly the shape `hashedQualityScore` left-joins.
  */
object QualityTraining {

  /** Deterministic weak labels: 1.0 where lexical diversity (distinct /
    * total tokens) ≥ `minDistinctRatio` AND mean token length lies in
    * `[minMeanLen, maxMeanLen]`, else 0.0. Output: (keyCol, label).
    */
  def weakQualityLabels(docs: DataFrame, keyCol: String,
      textCol: String = "text", minDistinctRatio: Double = 0.55,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 9.0): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol),
        size(col("tokens")).cast("long").as("_n"),
        size(array_distinct(col("tokens"))).cast("long").as("_d"),
        expr("aggregate(tokens, 0L, (a, t) -> a + length(t))").as("_chars"))
      .withColumn("label",
        (col("_d").cast("double") / col("_n") >= minDistinctRatio &&
          col("_chars").cast("double") / col("_n") >= minMeanLen &&
          col("_chars").cast("double") / col("_n") <= maxMeanLen).cast("double"))
      .select(keyCol, "label")

  /** Train integer-micros weights for [[TextAnalysis.hashedQualityScore]]
    * from `labels` (keyCol, label ∈ {0.0, 1.0}). Returns the sparse
    * (bucket, w_micros) table plus the intercept in micros — pass them as
    * (weights, biasMicros) with thresholdMicros = 0 to score at the
    * model's decision boundary.
    */
  def trainQualityWeights(docs: DataFrame, keyCol: String, labels: DataFrame,
      nBuckets: Int, textCol: String = "text", maxIter: Int = 50,
      regParam: Double = 0.01): (DataFrame, Long) = {
    require(nBuckets > 0, "nBuckets must be positive")
    val feats = TextAnalysis.withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .withColumn("bucket", expr(
        s"CAST(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT) % $nBuckets"))
      .groupBy(col(keyCol), col("bucket")).agg(count(lit(1)).as("cnt"))
      .groupBy(keyCol).agg(collect_list(struct(col("bucket"), col("cnt"))).as("_bc"))
    val toVec = udf { bc: Seq[Row] =>
      val total = bc.map(_.getLong(1)).sum.toDouble
      val pairs = bc.map(r => (r.getLong(0).toInt, r.getLong(1) / total))
        .sortBy(_._1)
      Vectors.sparse(nBuckets, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    }
    val train = feats.join(labels, Seq(keyCol))
      .select(toVec(col("_bc")).as("features"), col("label"))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(train)
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = model.coefficients.toArray.zipWithIndex
      .collect { case (w, b) if w != 0.0 => (b.toLong, math.round(w * 1e6)) }
      .toSeq.toDF("bucket", "w_micros")
    (weights, math.round(model.intercept * 1e6))
  }
}
