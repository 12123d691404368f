package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Active-learning acquisition: pick the items a labeling budget should
  * go to next (Settles' classic uncertainty sampling, the workhorse of
  * every annotation pipeline). Margin sampling — the gap between the
  * model's top two class scores — is the standard deep-pool criterion:
  * a confident item (huge margin) teaches the model nothing; the
  * decision-boundary items (tiny margin) are where labels buy accuracy.
  *
  * Input is the long (item, class, score) frame every scorer in this
  * engine already emits (q_labelnoise shape); scores are integer micros
  * so margin = top1 − top2 and least-confidence = 10⁶ − top1 are exact
  * Longs — the acquisition ranking replays bit-for-bit on any engine.
  *
  * Selection is STRATIFIED (per language, per source domain, …): budget
  * `perStratum` items from each stratum, lowest margin first, ties to
  * the smaller item id — without strata a margin sort funnels the whole
  * budget into the noisiest slice of the corpus.
  *
  * Scale shape: the per-item top-2 window runs over the K class rows of
  * one item (bounded, never the corpus); the per-stratum pick is a
  * rank-limit window Spark rewrites to WindowGroupLimit (map-side
  * partial top-k, the q_topk_grp shape) — no global sort, no collect.
  */
object ActiveLearning {

  /** Acquisition batch: (stratum, item, top_class, margin_micros,
    * least_conf_micros, pick_rank) — the `perStratum` lowest-margin
    * items of every stratum. `strata` maps item → stratum
    * (itemCol-keyed); items without a stratum row are dropped (they are
    * outside the labeling population by definition).
    */
  def acquisitionBatch(scores: DataFrame, itemCol: String, classCol: String,
      scoreCol: String, strata: DataFrame, stratumCol: String,
      perStratum: Int): DataFrame = {
    require(perStratum >= 1, "perStratum must be >= 1")
    val long = scores.select(col(itemCol).as("item"),
      col(classCol).cast("long").as("cls"),
      col(scoreCol).cast("long").as("score"))
    // top-2 per item: window over the K class rows of one item (bounded)
    val ranked = long.withColumn("_r", row_number().over(
      Window.partitionBy("item").orderBy(col("score").desc, col("cls"))))
    val top = ranked.filter(col("_r") <= 2)
      .groupBy("item")
      .agg(
        max(when(col("_r") === 1, col("cls"))).as("top_class"),
        max(when(col("_r") === 1, col("score"))).as("_s1"),
        max(when(col("_r") === 2, col("score"))).as("_s2"))
      // a single-class item has no runner-up: margin degenerates to the
      // full confidence (never picked while any 2-class item remains)
      .withColumn("margin_micros", col("_s1") - coalesce(col("_s2"), lit(0L)))
      .withColumn("least_conf_micros", lit(1000000L) - col("_s1"))
    top.join(strata.select(col(itemCol).as("item"),
        col(stratumCol).as("stratum")), Seq("item"))
      .withColumn("pick_rank", row_number().over(
        Window.partitionBy("stratum")
          .orderBy(col("margin_micros").asc, col("item"))).cast("long"))
      .filter(col("pick_rank") <= perStratum)
      .select("stratum", "item", "top_class", "margin_micros",
        "least_conf_micros", "pick_rank")
  }
}
