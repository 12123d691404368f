package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler — the "describe" every ingestion pipeline
  * runs before wiring a new source: per column the row count, null
  * count and EXACT distinct cardinality, in long format so downstream
  * checks (key-candidate detection: n_distinct = n_rows − n_null;
  * constant columns: n_distinct ≤ 1; null-heavy columns) are plain
  * filters over the profile.
  *
  * Exact distinct — not approx_count_distinct — because the profile's
  * consumers (primary-key verification, FK sanity) need equality, not
  * estimates; Spark plans the multi-distinct aggregate with one Expand
  * (×|cols| row multiplication, the standard exact form), so the pass
  * stays single-scan. Cardinality sketches live in
  * [[graft.text.CorpusSketches]] for when estimates suffice.
  *
  * Output: (column_name, n_rows, n_null, n_distinct) — n_distinct
  * counts non-null values, the SQL count(DISTINCT) convention on both
  * engines.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("_n") +:
      cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
          countDistinct(col(c)).as(s"_nd_$c"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"), col("_n").as("n_rows"),
        col(s"_null_$c").as("n_null"), col(s"_nd_$c").as("n_distinct"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select("p.column_name", "p.n_rows", "p.n_null", "p.n_distinct")
  }
}
