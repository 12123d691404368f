package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (entity, item) incidence — the classic
  * market-basket support/confidence/lift (Agrawal et al. 1993), reused
  * in data pipelines as the co-occurrence screen: which event types,
  * labels or sources travel together across users/documents far above
  * chance (lift ≫ 1) or suspiciously below it (lift ≪ 1, mutual
  * exclusion — often a logging bug).
  *
  * Exactness: supports are exact distinct-entity counts; confidence and
  * lift round ONCE via `div` micros. Overflow bound: N·s_ab·10⁶ stays
  * exact while N·s_ab ≤ 9·10¹² — stated per the repo convention.
  *
  * Scale shape: one distinct projection (entity, item), one self-join
  * keyed on the ENTITY (each entity's item set is bounded by the item
  * domain, so the join fans out at most |items|² per entity — never
  * entity × entity), one pair aggregate, then bounded item-marginal
  * broadcast joins and the 1-row total. The standard distributed
  * a-priori first pass.
  */
object Association {

  /** One row per unordered co-occurring item pair (item_a < item_b):
    * supports, both directional confidences, and the symmetric lift —
    * all in once-rounded micros over exact counts.
    */
  def pairLift(df: DataFrame, entityCol: String, itemCol: String): DataFrame = {
    val base = df.select(col(entityCol).as("e"), col(itemCol).as("i")).distinct()
    val total = base.agg(countDistinct("e").as("n_entities"))
    val marg = base.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val pairs = base.toDF("e", "item_a")
      .join(base.toDF("e", "item_b"), Seq("e"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("s_ab"))
    pairs
      .join(broadcast(marg.toDF("item_a", "s_a")), Seq("item_a"))
      .join(broadcast(marg.toDF("item_b", "s_b")), Seq("item_b"))
      .crossJoin(broadcast(total))
      .withColumn("conf_ab_micros", expr("s_ab * 1000000L div s_a"))
      .withColumn("conf_ba_micros", expr("s_ab * 1000000L div s_b"))
      .withColumn("lift_micros", expr("n_entities * s_ab * 1000000L div (s_a * s_b)"))
      .select("item_a", "item_b", "s_ab", "s_a", "s_b", "n_entities",
        "conf_ab_micros", "conf_ba_micros", "lift_micros")
  }
}
