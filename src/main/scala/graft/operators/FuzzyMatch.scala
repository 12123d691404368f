package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution by blocked fuzzy matching: find record pairs whose
  * names are within an edit-distance budget WITHOUT the all-pairs scan —
  * the classic record-linkage shape (blocking key → candidate pairs →
  * expensive verify on candidates only).
  *
  * The reference cleans name/email fields with regex normalization only
  * (reference/terraform/modules/glue/templates/bronze_to_silver_customers.py:94-117)
  * and never links near-identical records; real ingestion pipelines need
  * the linkage step for dedup across sources (the same entity arriving
  * spelled slightly differently).
  *
  * Scale shape: the candidate join is an EQUI-join on the blocking key —
  * shuffle rows = record count, candidate volume = Σ block²; blocks must
  * be chosen to keep that bounded (the contract every production linkage
  * system carries — too-coarse blocks explode quadratically, and the
  * operator cannot fix a bad key). The `levenshtein` verify is a
  * codegen'd per-row projection on candidates only; a length-difference
  * lower bound (|len(a)−len(b)| ≤ maxDist, since each edit changes
  * length by ≤ 1) prunes candidates BEFORE the O(|a|·|b|) DP runs.
  * Recall caveat, stated: a true match whose records disagree on a
  * blocking column is never compared — blocking trades that recall for
  * tractability; run multiple passes with different keys to recover it.
  */
object FuzzyMatch {

  /** Link `left` to `right`: pairs agreeing on every `blockCols` column
    * with normalized-`nameCol` edit distance ≤ `maxDist`. Output:
    * (id_a, id_b, dist). Normalization is lower+trim on both sides.
    */
  def blockedLinkage(left: DataFrame, right: DataFrame, idCol: String,
      nameCol: String, blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    def prep(df: DataFrame, suffix: String) =
      df.select((blockCols.map(col) :+
        col(idCol).as(s"id_$suffix") :+
        lower(trim(col(nameCol))).as(s"nm_$suffix")): _*)
    prep(left, "a").join(prep(right, "b"), blockCols)
      // cheap length lower bound first: each edit moves length by <= 1
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Self-match within one frame: each unordered pair once (id_a < id_b). */
  def blockedSelfMatch(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame =
    blockedLinkage(df, df, idCol, nameCol, blockCols, maxDist)
      .filter(col("id_a") < col("id_b"))
}
