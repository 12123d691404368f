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

  /** Krippendorff's alpha (nominal) over a long (item, rater, label)
    * frame — the agreement statistic that HANDLES MISSING RATINGS, which
    * real labeling runs always have (Cohen needs a fixed pair, Fleiss a
    * fixed panel; alpha takes whatever arrived). Items with a single
    * rating are dropped (they carry no pairable information — the
    * standard design); everything else contributes its m_u ratings.
    *
    * Coincidence-matrix form: with per-item category counts r_uc and
    * m_u = Σ_c r_uc ≥ 2,
    *
    *   n        = Σ_u m_u
    *   Σo_cc    = Σ_u (Σ_c r_uc(r_uc−1)) / (m_u−1)
    *   Do       = n − Σo_cc
    *   De       = (n² − Σ_c n_c²) / (n−1)
    *   alpha    = 1 − Do/De
    *
    * The per-item 1/(m_u−1) terms are the one place fractions enter:
    * each rounds ONCE to micros (`occ_u·10⁶ div (m_u−1)`) before the
    * exact Long sum — on a uniform panel this is a single shared
    * division (no rounding interplay), and in general it defines the
    * deterministic engine statistic, replayable anywhere. De rounds once
    * the same way. When De = 0 (all ratings one category) alpha is 1 on
    * perfect agreement and 0 otherwise, the [[cohenKappa]] convention;
    * with no pairable items alpha is null. Overflow bound: n²·10⁶ stays
    * exact while n ≤ 3·10⁶ ratings — the [[graft.graph.Graph.degreeAssortativity]]
    * stated-bound convention; re-derive before a web-scale label store.
    *
    * Output (one row): n_items, n_ratings, do_micros, de_micros, alpha.
    *
    * Scale shape: two keyed aggregates (item×label cells, per-item
    * sums), one label-cardinality aggregate, two broadcast 1-row
    * combines. No windows, no collects.
    */
  def krippendorffAlpha(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val cells = df.groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
    val perItem = cells.groupBy("item")
      .agg(sum("c").as("m"), sum(col("c") * (col("c") - 1)).as("occ"))
      .filter(col("m") >= 2)
    val totals = perItem.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum("m"), lit(0L)).as("n_ratings"),
      coalesce(sum(expr("occ * 1000000L div (m - 1)")), lit(0L)).as("_socc"))
    val nc2 = cells.join(perItem.select("item"), Seq("item"))
      .groupBy("label").agg(sum("c").as("n_c"))
      .agg(coalesce(sum(col("n_c") * col("n_c")), lit(0L)).as("_snc2"))
    totals.crossJoin(broadcast(nc2))
      // loud-failure guard on the stated n²·10⁶ exactness bound: beyond
      // 3e6 ratings De would overflow Long — throw, never return a
      // silently-wrong alpha (filter-hosted so pruning can't drop it).
      .filter(expr("assert_true(n_ratings <= 3000000L, " +
        "'krippendorffAlpha: n_ratings > 3e6 exceeds the exact n^2*1e6 Long bound') IS NULL"))
      .withColumn("do_micros", expr("n_ratings * 1000000L - _socc"))
      .withColumn("de_micros", expr(
        "CASE WHEN n_ratings >= 2 THEN (n_ratings * n_ratings - _snc2) * 1000000L div (n_ratings - 1) END"))
      .withColumn("alpha",
        when(col("de_micros").isNull, lit(null).cast("double"))
          .when(col("de_micros") === 0L,
            when(col("do_micros") === 0L, lit(1.0d)).otherwise(lit(0.0d)))
          .otherwise(lit(1.0d) -
            col("do_micros").cast("double") / col("de_micros").cast("double")))
      .select("n_items", "n_ratings", "do_micros", "de_micros", "alpha")
  }
}
