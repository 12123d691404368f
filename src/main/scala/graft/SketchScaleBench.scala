package graft

import org.apache.spark.sql.functions._

/** Scale validation for the relational sketch suite and sentence dedup.
  * Claims under test:
  *
  * - `CorpusSketches.cmsCells` / `hllRegisters` / `logHistogram` carry
  *   bounded state: the OUTPUT row count stays ≤ depth·width / m / 64
  *   per group no matter how many items stream through, and wall time
  *   grows ~linearly with input (the map-side combine does the
  *   compression before any shuffle).
  * - `CorpusCuration.sentenceDedup` survives a pathologically duplicated
  *   corpus (every doc shares half its sentences): the groupBy-MIN first
  *   owner keeps per-key reduce state at one (doc, idx) pair, so 4×
  *   input ⇒ ~4× wall, not hot-task collapse.
  *
  * Usage: runMain graft.SketchScaleBench [n1 n2 ...] (default 1000000 4000000)
  */
object SketchScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1000000, 4000000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{CorpusCuration, CorpusSketches}
    for (n <- sizes) {
      // zipf-ish token stream over a 100k vocabulary, 4 groups
      val toks = spark.range(n).select(
        (col("id") % 4).cast("string").as("grp"),
        concat(lit("t"), (abs(xxhash64(col("id"))) % 100000).cast("string")).as("token"))
      val t0 = System.nanoTime()
      val cmsRows = CorpusSketches.cmsCells(toks, "token", depth = 4, width = 1024).count()
      val tCms = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hllRows = CorpusSketches.hllRegisters(toks, "grp", "token").count()
      val tHll = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val histRows = CorpusSketches.logHistogram(
        toks.select(col("grp"), (abs(xxhash64(col("token"))) % 100000).as("v")),
        "grp", "v").count()
      val tHist = (System.nanoTime() - t2) / 1e9
      println(f"n=$n cms_cells=$cmsRows (<=4096) sec=$tCms%.1f | " +
        f"hll_regs=$hllRows (<=4x256) sec=$tHll%.1f | hist_cells=$histRows (<=4x64) sec=$tHist%.1f")

      // sentence dedup on a boilerplate-heavy corpus: n/100 docs, each
      // 5 shared chrome sentences (duplicated across ALL docs) + 5 unique
      val docs = spark.range(n / 100).select(col("id").as("doc_id"),
        concat(
          lit("shared one. shared two. shared three. shared four. shared five. "),
          concat_ws(" ", (0 until 5).map(i =>
            concat(lit(s"unique$i "), col("id"), lit(" tail."))): _*)).as("text"))
      val t3 = System.nanoTime()
      val kept = CorpusCuration.sentenceDedup(docs, "doc_id")
        .agg(sum("n_kept")).head.getLong(0)
      val tSd = (System.nanoTime() - t3) / 1e9
      println(f"n_docs=${n / 100} sent_dedup_kept=$kept sec=$tSd%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
