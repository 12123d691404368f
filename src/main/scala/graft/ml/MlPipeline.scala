package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.DataFrame

/** ML layer (M6–M9, M11): feature assembly/scaling/encoding, RF/GBT/LR
  * training, evaluation metrics, k-fold CV and grid tuning — all spark.ml
  * (distributed; the reference trains single-node sklearn,
  * reference/sagemaker/training/train.py:106-170).
  */
object MlPipeline {

  /** M6: assemble numeric features (+ optional categorical string index)
    * into a scaled vector column.
    */
  def featurePipeline(numericCols: Seq[String],
      categoricalCol: Option[String] = None): Pipeline = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.ml.PipelineStage]
    val inputCols = categoricalCol match {
      case Some(c) =>
        stages += new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
          .setHandleInvalid("keep")
        numericCols :+ s"${c}_idx"
      case None => numericCols
    }
    stages += new VectorAssembler().setInputCols(inputCols.toArray)
      .setOutputCol("features_raw").setHandleInvalid("keep")
    stages += new StandardScaler().setInputCol("features_raw")
      .setOutputCol("features").setWithMean(true).setWithStd(true)
    new Pipeline().setStages(stages.toArray)
  }

  /** M7: the three reference classifier families behind one switch. */
  def classifier(kind: String, labelCol: String, seed: Long = 42L) = kind match {
    case "rf" => new RandomForestClassifier().setLabelCol(labelCol)
      .setFeaturesCol("features").setNumTrees(50).setSeed(seed)
    case "gbt" => new GBTClassifier().setLabelCol(labelCol)
      .setFeaturesCol("features").setMaxIter(20).setSeed(seed)
    case "lr" => new LogisticRegression().setLabelCol(labelCol)
      .setFeaturesCol("features").setMaxIter(50)
    case other => throw new IllegalArgumentException(s"unknown classifier: $other")
  }

  def trainClassifier(df: DataFrame, numericCols: Seq[String], labelCol: String,
      kind: String = "lr", seed: Long = 42L): PipelineModel = {
    val fp = featurePipeline(numericCols)
    new Pipeline().setStages(fp.getStages :+ classifier(kind, labelCol, seed)).fit(df)
  }

  /** M8: standard evaluation metric set on a scored frame. */
  def classificationMetrics(scored: DataFrame, labelCol: String): Map[String, Double] = {
    def m(metric: String) = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName(metric).evaluate(scored)
    Map(
      "accuracy" -> m("accuracy"),
      "f1" -> m("f1"),
      "weightedPrecision" -> m("weightedPrecision"),
      "weightedRecall" -> m("weightedRecall"))
  }

  def aucRoc(scored: DataFrame, labelCol: String): Double =
    new BinaryClassificationEvaluator().setLabelCol(labelCol)
      .setRawPredictionCol("rawPrediction").setMetricName("areaUnderROC")
      .evaluate(scored)

  def regressionMetrics(scored: DataFrame, labelCol: String): Map[String, Double] = {
    def m(metric: String) = new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName(metric).evaluate(scored)
    Map("rmse" -> m("rmse"), "mae" -> m("mae"), "r2" -> m("r2"))
  }

  /** M9+M11: k-fold cross-validation over a small LR grid (grid/random
    * search; the reference's Bayesian HPO is a managed-service feature, out
    * of engine scope per SURVEY §2.11).
    */
  def crossValidateLr(df: DataFrame, numericCols: Seq[String], labelCol: String,
      folds: Int = 5, seed: Long = 42L): CrossValidatorModel = {
    val fp = featurePipeline(numericCols)
    val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
    val pipe = new Pipeline().setStages(fp.getStages :+ lr)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.01, 0.1))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5))
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setSeed(seed)
      .setParallelism(4)
      .fit(df)
  }

  /** M9 (oracle-checkable fold assignment): deterministic keyed folds —
    * fold = key mod k, the keyedSplit/M5 recipe at the CV grain. Unlike
    * the seeded random split inside spark.ml's default kFold (a
    * partitioning-dependent Bernoulli sampler no other engine can
    * replay), the keyed assignment is reproducible in any engine AND
    * leakage-stable: an entity keeps its fold across reruns and data
    * growth. spark.ml's CrossValidator consumes the column directly via
    * foldCol ([[crossValidateLrKeyed]]), so the assignment registered
    * under the DuckDB oracle IS the split the trainer uses — not a
    * parallel reimplementation.
    */
  def cvFoldAssignment(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    require(k >= 2, s"need k >= 2 folds: $k")
    import org.apache.spark.sql.functions.{col, lit, pmod}
    df.withColumn("fold", pmod(col(keyCol), lit(k)).cast("int"))
  }

  /** M9 variant of [[crossValidateLr]] driven by the deterministic keyed
    * fold column (CrossValidator.setFoldCol) instead of the seeded random
    * kFold — the form whose fold assignment q_cvfolds oracle-checks.
    */
  def crossValidateLrKeyed(df: DataFrame, numericCols: Seq[String],
      labelCol: String, keyCol: String, folds: Int = 5): CrossValidatorModel = {
    val fp = featurePipeline(numericCols)
    val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
    val pipe = new Pipeline().setStages(fp.getStages :+ lr)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.1))
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setFoldCol("fold")
      .setParallelism(4)
      .fit(cvFoldAssignment(df, keyCol, folds))
  }

  /** Continuous hyperparameter range, matching the reference's
    * ContinuousParameter declarations
    * (reference/lambda/ml_pipeline_orchestrator/lambda_function.py:97-198).
    * `logScale` samples log-uniformly — the right prior for regularization
    * strengths spanning orders of magnitude.
    */
  final case class ParamRange(name: String, lo: Double, hi: Double,
      logScale: Boolean = false) {
    require(lo <= hi && (!logScale || lo > 0), s"bad range for $name")
    def sample(u: Double): Double =
      if (logScale) math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
      else lo + u * (hi - lo)
  }

  /** M11: range-based hyperparameter search — the engine-side stand-in for
    * the reference's Bayesian HPO job config: seeded random sampling over
    * the declared ranges, each trial scored with k-fold CV, trials trained
    * in parallel. Random search over low-dimensional continuous ranges is
    * competitive with Bayesian optimization at a few dozen trials
    * (Bergstra & Bengio, JMLR 2012) and — unlike a sequential Bayesian
    * loop — keeps every trial independent, so the cluster stays busy.
    */
  def randomSearchLr(df: DataFrame, numericCols: Seq[String], labelCol: String,
      ranges: Seq[ParamRange], trials: Int = 16, folds: Int = 3,
      seed: Long = 42L): CrossValidatorModel = {
    require(trials > 0, "trials must be positive")
    val fp = featurePipeline(numericCols)
    val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
    val pipe = new Pipeline().setStages(fp.getStages :+ lr)
    val rnd = new scala.util.Random(seed)
    val maps = Array.fill(trials) {
      val pm = new org.apache.spark.ml.param.ParamMap()
      ranges.foreach { r =>
        val v = r.sample(rnd.nextDouble())
        r.name match {
          case "regParam"        => pm.put(lr.regParam, v)
          case "elasticNetParam" => pm.put(lr.elasticNetParam, v)
          case "tol"             => pm.put(lr.tol, v)
          case "maxIter"         => pm.put(lr.maxIter, math.round(v).toInt)
          case other => throw new IllegalArgumentException(s"unknown LR param: $other")
        }
      }
      pm
    }
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1"))
      .setEstimatorParamMaps(maps)
      .setNumFolds(folds)
      .setSeed(seed)
      .setParallelism(4)
      .fit(df)
  }

  final case class HalvingTrial(params: Map[String, Double], score: Double,
      round: Int, trainFraction: Double)

  /** M11, the SEQUENTIAL form: successive halving (Jamieson & Talwalkar,
    * AISTATS 2016 — the inner loop of Hyperband). Start many seeded
    * configurations on a small training fraction, keep the top half each
    * round, and double the budget for the survivors — the adaptive
    * explore-then-exploit behavior the reference buys from its managed
    * Bayesian HPO job, without a surrogate model: fully deterministic
    * (seeded sampling, seeded fraction splits, score ties broken by
    * config index) and cluster-friendly (each round's survivors train in
    * parallel; only the ROUNDS are sequential, and there are
    * log2(trials) of them). Returns every trial's history plus the
    * winner, so the caller can audit the halving path.
    */
  def successiveHalvingLr(df: DataFrame, numericCols: Seq[String], labelCol: String,
      ranges: Seq[ParamRange], trials: Int = 8, seed: Long = 42L,
      minFraction: Double = 0.25): (Map[String, Double], Seq[HalvingTrial]) = {
    require(trials >= 2, "need at least 2 trials to halve")
    val rnd = new scala.util.Random(seed)
    var configs: Seq[(Int, Map[String, Double])] = (0 until trials).map { i =>
      i -> ranges.map(r => r.name -> r.sample(rnd.nextDouble())).toMap
    }
    val rounds = (math.log(trials.toDouble) / math.log(2.0)).ceil.toInt
    val history = scala.collection.mutable.ArrayBuffer.empty[HalvingTrial]
    val Array(trainFull, test) = df.randomSplit(Array(0.8, 0.2), seed)
    val evalCount = test.cache().count()
    require(evalCount > 0, "empty eval split")

    for (round <- 0 until rounds if configs.size > 1) {
      val frac = math.min(1.0, minFraction * (1 << round))
      val train = if (frac >= 1.0) trainFull
        else trainFull.sample(withReplacement = false, frac, seed + round)
      val scored = configs.map { case (idx, params) =>
        val fp = featurePipeline(numericCols)
        val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
        params.foreach {
          case ("regParam", v)        => lr.setRegParam(v)
          case ("elasticNetParam", v) => lr.setElasticNetParam(v)
          case ("tol", v)             => lr.setTol(v)
          case ("maxIter", v)         => lr.setMaxIter(math.round(v).toInt)
          case (other, _) => throw new IllegalArgumentException(s"unknown LR param: $other")
        }
        val model = new Pipeline().setStages(fp.getStages :+ lr).fit(train)
        val f1 = new MulticlassClassificationEvaluator()
          .setLabelCol(labelCol).setMetricName("f1")
          .evaluate(model.transform(test))
        history += HalvingTrial(params, f1, round, frac)
        (idx, params, f1)
      }
      // keep the top half; ties broken by config index for determinism
      configs = scored.sortBy { case (idx, _, f1) => (-f1, idx) }
        .take(math.max(1, configs.size / 2))
        .map { case (idx, params, _) => idx -> params }
    }
    test.unpersist()
    (configs.head._2, history.toSeq)
  }

  final case class BayesTrial(params: Map[String, Double], score: Double,
      phase: String, expectedImprovement: Double)

  /** M11, the SURROGATE-MODEL form: sequential Bayesian optimization — the
    * engine-side equivalent of the reference's managed HPO job's declared
    * "Bayesian" strategy
    * (reference/lambda/ml_pipeline_orchestrator/lambda_function.py:97-198).
    *
    * Loop: a seeded init design of `initTrials` random configs is evaluated,
    * then each of `iterations` rounds fits a Gaussian-process surrogate
    * (RBF kernel over unit-normalized params, standardized scores, Cholesky
    * solve via commons-math3, which Spark already ships) to every trial so
    * far, and evaluates the config maximizing Expected Improvement over a
    * seeded candidate pool. Fully deterministic: seeded init design, seeded
    * candidate pools, EI ties broken by candidate index.
    *
    * Scale shape: the surrogate math is O(n³) on n ≤ a few dozen TRIALS —
    * microseconds on the driver, never touching the cluster; all data-sized
    * work (each trial's train + eval) is distributed spark.ml. The loop is
    * sequential BY DESIGN (each trial conditions on all previous ones) —
    * when cluster utilization matters more than trial efficiency, prefer
    * randomSearchLr (all trials independent) or successiveHalvingLr.
    */
  def bayesianSearchLr(df: DataFrame, numericCols: Seq[String], labelCol: String,
      ranges: Seq[ParamRange], initTrials: Int = 4, iterations: Int = 6,
      candidatesPerIter: Int = 256, seed: Long = 42L): (Map[String, Double], Seq[BayesTrial]) = {
    require(initTrials >= 2, "need >= 2 init trials to fit a surrogate")
    require(ranges.nonEmpty, "need at least one parameter range")
    import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector, CholeskyDecomposition}
    val rnd = new scala.util.Random(seed)
    val d = ranges.size
    val lengthScale = 0.3
    val noise = 1e-6

    val Array(trainFull, test) = df.randomSplit(Array(0.8, 0.2), seed)
    trainFull.cache(); test.cache()
    require(test.count() > 0, "empty eval split")

    def toParams(u: IndexedSeq[Double]): Map[String, Double] =
      ranges.zip(u).map { case (r, ui) => r.name -> r.sample(ui) }.toMap
    def evaluate(params: Map[String, Double]): Double = {
      val fp = featurePipeline(numericCols)
      val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
      params.foreach {
        case ("regParam", v)        => lr.setRegParam(v)
        case ("elasticNetParam", v) => lr.setElasticNetParam(v)
        case ("tol", v)             => lr.setTol(v)
        case ("maxIter", v)         => lr.setMaxIter(math.round(v).toInt)
        case (other, _) => throw new IllegalArgumentException(s"unknown LR param: $other")
      }
      val model = new Pipeline().setStages(fp.getStages :+ lr).fit(trainFull)
      new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1")
        .evaluate(model.transform(test))
    }
    def kern(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val dx = a(i) - b(i); s += dx * dx; i += 1 }
      math.exp(-s / (2.0 * lengthScale * lengthScale))
    }
    // standard normal pdf/cdf for EI (cdf via the erf-free Zelen & Severo
    // rational approximation, |err| < 7.5e-8 — plenty for an acquisition)
    def phi(z: Double) = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi)
    def cdf(z: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      val tail = phi(z) * poly
      if (z >= 0) 1.0 - tail else tail
    }

    val xs = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Double]]
    val history = scala.collection.mutable.ArrayBuffer.empty[BayesTrial]
    def record(u: IndexedSeq[Double], phase: String, ei: Double): Unit = {
      val p = toParams(u)
      xs += u
      history += BayesTrial(p, evaluate(p), phase, ei)
    }
    (0 until initTrials).foreach { _ =>
      record(IndexedSeq.fill(d)(rnd.nextDouble()), "init", 0.0)
    }

    for (_ <- 0 until iterations) {
      val n = xs.size
      val ys = history.map(_.score)
      val mean = ys.sum / n
      val sd0 = math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / n)
      val sd = if (sd0 < 1e-12) 1.0 else sd0
      val y = ys.map(v => (v - mean) / sd).toArray
      val k = Array.tabulate(n, n)((i, j) =>
        kern(xs(i), xs(j)) + (if (i == j) noise else 0.0))
      val solver = new CholeskyDecomposition(
        new Array2DRowRealMatrix(k), 1e-10, 1e-12).getSolver
      val alpha = solver.solve(new ArrayRealVector(y)).toArray
      val bestStd = y.max
      def ei(u: IndexedSeq[Double]): Double = {
        val ks = Array.tabulate(n)(i => kern(xs(i), u))
        var mu = 0.0; var i = 0
        while (i < n) { mu += ks(i) * alpha(i); i += 1 }
        val kInvKs = solver.solve(new ArrayRealVector(ks)).toArray
        var quad = 0.0; i = 0
        while (i < n) { quad += ks(i) * kInvKs(i); i += 1 }
        val variance = math.max(1.0 + noise - quad, 0.0)
        val sigma = math.sqrt(variance)
        if (sigma < 1e-12) 0.0
        else {
          val xi = 0.01
          val z = (mu - bestStd - xi) / sigma
          math.max((mu - bestStd - xi) * cdf(z) + sigma * phi(z), 0.0)
        }
      }
      // argmax EI over a fresh seeded candidate pool; strict > keeps the
      // earliest candidate on ties, so the loop is bit-deterministic
      var bestU: IndexedSeq[Double] = null
      var bestEi = -1.0
      (0 until candidatesPerIter).foreach { _ =>
        val u = IndexedSeq.fill(d)(rnd.nextDouble())
        val e = ei(u)
        if (e > bestEi) { bestEi = e; bestU = u }
      }
      record(bestU, "bayes", bestEi)
    }
    trainFull.unpersist(); test.unpersist()
    val best = history.zipWithIndex.maxBy { case (t, i) => (t.score, -i) }._1
    (best.params, history.toSeq)
  }

  /** Binary classification report from boolean prediction/label columns:
    * one exact-count pass (tp/fp/fn/tn) plus precision, recall, F1 and
    * accuracy as integer micros — each a SINGLE division of exact longs
    * (F1 as 2tp/(2tp+fp+fn), no intermediate p·r product), so the report
    * is bit-identical across engines and partitionings; degenerate
    * denominators yield null, not Infinity. The oracle-checkable
    * complement to the spark.ml evaluator metrics (spec-verified M8) —
    * run it wherever predictions and truth are both columns, e.g. a
    * quality classifier against its weak labels.
    */
  def classificationReport(df: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column,
      label: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def micros(num: String, den: String) = expr(
      s"CASE WHEN $den > 0 THEN CAST(floor(CAST($num AS DOUBLE) / ($den) * 1e6 + 0.5) AS BIGINT) END")
    df.agg(
        sum(when(pred && label, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !label, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && label, 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && !label, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_micros", micros("tp", "tp + fp"))
      .withColumn("recall_micros", micros("tp", "tp + fn"))
      .withColumn("f1_micros", micros("2 * tp", "2 * tp + fp + fn"))
      .withColumn("accuracy_micros", micros("tp + tn", "tp + fp + fn + tn"))
  }
}
