package graft

import org.apache.spark.sql.functions._
import graft.text.CorpusCuration

/** Scale validation for concat-then-chunk packing: the global token
  * offsets come from a two-pass distributed prefix sum (range-sort +
  * per-partition subtotals + driver offset scan), so wall time should
  * grow ~linearly with the corpus while the driver only ever sees
  * numPartitions subtotal values. Invariants checked at every size:
  * dense sequence ids, every sequence full except the last, filled
  * slots equal to the token stream.
  *
  * Usage: runMain graft.PackScaleBench [n1 n2 ...] (default 250000 1000000)
  */
object PackScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(250000, 1000000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val cap = 2048L
    for (n <- sizes) {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        (abs(xxhash64(col("id"))) % 900L + 100L).as("n_tokens")).cache()
      val total = docs.agg(sum(col("n_tokens") + 1L)).head().getLong(0)
      val t0 = System.nanoTime()
      val seqs = CorpusCuration.packSequences(docs, cap, "n_tokens").cache()
      val nSeqs = seqs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val filled = seqs.agg(sum("n_tokens")).head().getLong(0)
      val fullSeqs = seqs.filter(col("n_tokens") === cap).count()
      val ok = nSeqs == (total + cap - 1) / cap && filled == total &&
        fullSeqs >= nSeqs - 1
      println(f"docs=$n seqs=$nSeqs tokens=$total invariants_ok=$ok sec=$dt%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
