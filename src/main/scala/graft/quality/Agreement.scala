package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeling-QA layer a training-data
  * pipeline needs once humans (or LLM judges) produce the labels the
  * quality classifiers and preference pairs consume: Cohen's kappa for a
  * rater pair and Fleiss' kappa for a fixed-size panel (Cohen 1960,
  * Fleiss 1971). Chance-corrected agreement is the standard screen for
  * "are these labels worth training on" — raw percent agreement is
  * inflated whenever the label distribution is skewed, which curation
  * labels (keep/drop) always are.
  *
  * Exactness contract: every ingredient is an exact integer count
  * (agreements, per-category marginals, Σ marginal products, Σ squared
  * cell counts), and the final probabilities/kappa are derived from those
  * longs by a FIXED double expression (cast → divide → subtract →
  * divide). IEEE-754 ops on identical integers are bit-deterministic, so
  * the doubles replay exactly on any engine — the repo-wide
  * derive-doubles-from-exact-sums rule.
  *
  * Scale shape: keyed aggregates only (groupBy item×label, groupBy
  * label), then category-sized (bounded) marginal joins and the blessed
  * broadcast-1-row scalar combine. No windows, no collects over data-
  * sized frames — a 100 TB label store screens on counts.
  */
object Agreement {

  /** Cohen's kappa between raters `raterA` and `raterB` over a long
    * (item, rater, label) frame. Items labeled by both raters count;
    * items seen by only one are dropped (the standard pairwise design).
    *
    * κ = (p_o − p_e) / (1 − p_e) with p_o = agree/N and
    * p_e = Σ_k a_k·b_k / N² (a_k, b_k the raters' category marginals).
    * When p_e = 1 (both raters constant) κ is defined as 1 on perfect
    * agreement and 0 otherwise.
    *
    * Output (one row): n_items, agree, pe_num (= Σ a_k b_k), po, pe,
    * kappa — counts BIGINT, probabilities DOUBLE.
    */
  def cohenKappa(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String, raterA: Long, raterB: Long): DataFrame = {
    val a = df.filter(col(raterCol) === raterA)
      .select(col(itemCol).as("item"), col(labelCol).as("label_a"))
    val b = df.filter(col(raterCol) === raterB)
      .select(col(itemCol).as("item"), col(labelCol).as("label_b"))
    val joined = a.join(b, Seq("item"))
    val totals = joined.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("label_a") === col("label_b"), 1L).otherwise(0L)).as("agree"))
    // Category marginals are label-cardinality-sized — bounded, broadcast.
    val margA = joined.groupBy(col("label_a").as("label"))
      .agg(count(lit(1)).as("a_k"))
    val margB = joined.groupBy(col("label_b").as("label"))
      .agg(count(lit(1)).as("b_k"))
    val peNum = margA.join(margB, Seq("label"))
      .agg(coalesce(sum(col("a_k") * col("b_k")), lit(0L)).as("pe_num"))
    totals.crossJoin(broadcast(peNum))
      .withColumn("po", col("agree").cast("double") / col("n_items").cast("double"))
      .withColumn("pe", col("pe_num").cast("double") /
        (col("n_items").cast("double") * col("n_items").cast("double")))
      .withColumn("kappa",
        when(col("pe") === 1.0d,
          when(col("po") === 1.0d, lit(1.0d)).otherwise(lit(0.0d)))
          .otherwise((col("po") - col("pe")) / (lit(1.0d) - col("pe"))))
  }

  /** Fleiss' kappa over a long (item, rater, label) frame where every
    * item carries the SAME number of ratings m ≥ 2 (the fixed-panel
    * design Fleiss assumes). Throws on ragged panels rather than
    * returning a silently-wrong statistic — the kCore non-convergence
    * contract.
    *
    * With cell counts n_ik (ratings of item i in category k):
    * P̄ = S1 / (N·m·(m−1)) where S1 = Σ_ik n_ik² − N·m, and
    * p_e = S2 / (N·m)² where S2 = Σ_k (Σ_i n_ik)²;
    * κ = (P̄ − p_e) / (1 − p_e), with the p_e = 1 convention as in
    * [[cohenKappa]].
    *
    * Output (one row): n_items, n_raters, s1, s2 (BIGINT), pbar, pe,
    * kappa (DOUBLE).
    */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val cells = df.groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
    // Panel-size uniformity: one bounded 2-value aggregate (min, max of
    // the per-item rating counts), checked eagerly.
    val perItem = cells.groupBy("item").agg(sum("c").as("m"))
    val Array(mMin, mMax) = perItem.agg(min("m"), max("m")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    require(mMin == mMax && mMin >= 2,
      s"Fleiss' kappa needs a fixed panel of >= 2 raters per item; saw m in [$mMin, $mMax]")
    val m = mMin
    val s1 = cells.agg(
      countDistinct("item").as("n_items"),
      (sum(col("c") * col("c")) - countDistinct("item") * m).as("s1"))
    val s2 = cells.groupBy("label").agg(sum("c").as("c_k"))
      .agg(sum(col("c_k") * col("c_k")).as("s2"))
    s1.crossJoin(broadcast(s2))
      .select(col("n_items"), lit(m).as("n_raters"), col("s1"), col("s2"))
      .withColumn("pbar", col("s1").cast("double") /
        (col("n_items").cast("double") * lit(m.toDouble) * lit((m - 1).toDouble)))
      .withColumn("pe", col("s2").cast("double") /
        ((col("n_items").cast("double") * lit(m.toDouble)) *
          (col("n_items").cast("double") * lit(m.toDouble))))
      .withColumn("kappa",
        when(col("pe") === 1.0d,
          when(col("pbar") === 1.0d, lit(1.0d)).otherwise(lit(0.0d)))
          .otherwise((col("pbar") - col("pe")) / (lit(1.0d) - col("pe"))))
  }
}
