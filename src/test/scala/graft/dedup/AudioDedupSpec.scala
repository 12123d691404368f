package graft.dedup

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual audio dedup: energy-delta hash locality on real RIFF/WAVE
  * PCM round-trips and the grain-agnostic banded pipeline on hand-planted
  * pairs — [[ImageDedupSpec]] at the audio grain.
  */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("energy hash locality: level shift = 0 bits, one-window bump <= 2 bits, distinct clips far") {
    val base = Multimodal.audioEnergyHash64(Multimodal.blockWav("t1")).get
    val shifted = Multimodal.audioEnergyHash64(Multimodal.blockWav("t1", levelDelta = 8)).get
    assert(hamming(base, shifted) === 0, "uniform level shift preserves every energy-gradient sign")
    for (t <- Seq("t1", "t2", "t3", "t4", "t5")) {
      val b0 = Multimodal.audioEnergyHash64(Multimodal.blockWav(t)).get
      val b1 = Multimodal.audioEnergyHash64(Multimodal.blockWav(t, bumpWindow = Some(30))).get
      assert(hamming(b0, b1) <= 2, s"$t: one-window bump flips at most its 2 comparisons")
    }
    val other = Multimodal.audioEnergyHash64(Multimodal.blockWav("t2")).get
    assert(hamming(base, other) > 3, "independent clips live outside the acceptance region")
    // determinism: same tag, same bytes, same hash
    assert(Multimodal.audioEnergyHash64(Multimodal.blockWav("t1")).get === base)
  }

  test("energy hash recovers the planted window levels exactly") {
    // blockWav plants A_w = (32 + md5%160) * 128 as each window's square
    // amplitude; the hash's window energies are exactly those levels, so
    // the bit pattern is fully determined by the md5 level sequence.
    val md = java.security.MessageDigest.getInstance("MD5")
    val levels = (0 until 65).map { w =>
      val d = md.digest(s"aud|7|$w".getBytes("UTF-8"))
      (32 + ((d(0) & 0xff) % 160)) * 128L
    }
    var expected = 0L
    for (b <- 0 until 64) if (levels(b) < levels(b + 1)) expected |= 1L << b
    assert(Multimodal.audioEnergyHash64(Multimodal.blockWav("aud|7")).get === expected)
  }

  test("energy hash rejects non-audio, stereo stays out via the mono contract") {
    assert(Multimodal.audioEnergyHash64("not a wav".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.audioEnergyHash64(Multimodal.blockPng("img")).isEmpty,
      "a PNG is not a WAV — no fake fingerprints for other media")
    // a decodable WAV that is too short for 65 windows is rejected, not hashed
    val tiny = {
      val bb = java.nio.ByteBuffer.allocate(44 + 20 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 40)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(40)
      for (_ <- 0 until 20) bb.putShort(100)
      bb.array()
    }
    assert(Multimodal.decodeWav(tiny).isDefined, "the clip itself decodes")
    assert(Multimodal.audioEnergyHash64(tiny).isEmpty, "but is below the 65-window floor")
  }

  test("banded pipeline finds exactly the planted audio pairs; nulls excluded") {
    val rows = Seq(
      (1L, Multimodal.blockWav("a")),
      (101L, Multimodal.blockWav("a", levelDelta = 8)),
      (2L, Multimodal.blockWav("b")),
      (102L, Multimodal.blockWav("b", bumpWindow = Some(30))),
      (3L, Multimodal.blockWav("c")),
      (4L, "junk bytes".getBytes("UTF-8")))
    val df = rows.toDF("aud_id", "media")
    val pairs = ImageDedup.dHashPairs(
        Multimodal.audioEnergyHashes(df, "aud_id"), "aud_id",
        bands = 4, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 101L), (2L, 102L)))
  }

  test("syntheticBlockWavs plants twins by id arithmetic with real container round-trips") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val clips = Multimodal.syntheticBlockWavs(ids, "doc_id")
    // 60 bases + twins at 0, 20, 40
    assert(clips.count() === 63)
    val hashes = Multimodal.audioEnergyHashes(clips, "aud_id")
    assert(hashes.filter(col("dhash").isNull).count() === 0,
      "every synthetic clip is a decodable mono PCM WAV")
    val pairs = ImageDedup.dHashPairs(hashes, "aud_id", bands = 4, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 10000000L), (20L, 10000020L), (40L, 10000040L)))
  }
}
