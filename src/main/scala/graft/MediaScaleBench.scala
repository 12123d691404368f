package graft

import org.apache.spark.sql.functions._
import graft.dedup.ImageDedup
import graft.multimodal.Multimodal

/** Scale validation for the perceptual image dedup path: synthesize a
  * deterministic PNG corpus with planted perturbed twins (1 per 20 ids —
  * the q_imgdedup construction), run dHash extraction + banded hamming
  * pairing at increasing corpus sizes, and report wall time + planted
  * recall + pair count. The claims under test: runtime grows ~linearly
  * with the corpus (the hash pass is one mapPartitions over the media
  * bytes; candidates come from 16-bit band buckets, never all-pairs),
  * recall of planted twins stays 1.0 (pigeonhole at maxHamming 3 <
  * bands 4), and no false pairs appear (random fingerprints collide at
  * hamming <= 3 w.p. ~2e-15/pair).
  *
  * Usage: runMain graft.MediaScaleBench [n1 n2 ...]   (default 20000 40000)
  */
object MediaScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(20000, 40000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val images = Multimodal.syntheticBlockImages(ids, "doc_id").cache()
      val nImages = images.count() // PNG encode billed here
      val t0 = System.nanoTime()
      val pairs = ImageDedup.dHashPairs(
        Multimodal.dHashes(images, "img_id"), "img_id",
        bands = 4, maxHamming = 3).cache()
      val total = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nPlanted = (n + 19) / 20
      val found = pairs.filter(col("doc_b") === col("doc_a") + 10000000L).count()
      println(f"images=$nImages pairs=$total planted=$nPlanted " +
        f"recall=${found.toDouble / nPlanted}%.2f false_pairs=${total - found} sec=$dt%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
