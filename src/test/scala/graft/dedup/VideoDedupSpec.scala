package graft.dedup

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual video dedup: temporal luma-gradient hash locality on real
  * YUV4MPEG2 round-trips and the grain-agnostic banded pipeline on
  * hand-planted pairs — [[AudioDedupSpec]] at the video grain.
  */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("temporal hash locality: brightness shift = 0 bits, one-frame bump <= 2 bits, distinct clips far") {
    val base = Multimodal.videoTemporalHash64(Multimodal.blockY4m("t1")).get
    val shifted = Multimodal.videoTemporalHash64(
      Multimodal.blockY4m("t1", levelDelta = 8)).get
    assert(hamming(base, shifted) === 0,
      "uniform brightness shift preserves every luma-gradient sign")
    for (t <- Seq("t1", "t2", "t3", "t4", "t5")) {
      val b0 = Multimodal.videoTemporalHash64(Multimodal.blockY4m(t)).get
      val b1 = Multimodal.videoTemporalHash64(
        Multimodal.blockY4m(t, bumpFrame = Some(30))).get
      assert(hamming(b0, b1) <= 2, s"$t: one-frame bump flips at most its 2 comparisons")
    }
    val other = Multimodal.videoTemporalHash64(Multimodal.blockY4m("t2")).get
    assert(hamming(base, other) > 3, "independent clips live outside the acceptance region")
    assert(Multimodal.videoTemporalHash64(Multimodal.blockY4m("t1")).get === base)
  }

  test("temporal hash recovers the planted frame levels exactly") {
    // blockY4m plants level_f = 32 + md5(tag|f) % 160 as frame f's constant
    // luma plane; with one frame per window the hash's energies ARE those
    // levels, so the bit pattern is fully determined by the md5 sequence.
    val md = java.security.MessageDigest.getInstance("MD5")
    val levels = (0 until 65).map { f =>
      val d = md.digest(s"vid|7|$f".getBytes("UTF-8"))
      (32 + ((d(0) & 0xff) % 160)).toLong
    }
    var expected = 0L
    for (b <- 0 until 64) if (levels(b) < levels(b + 1)) expected |= 1L << b
    assert(Multimodal.videoTemporalHash64(Multimodal.blockY4m("vid|7")).get === expected)
  }

  test("temporal hash rejects non-video and sub-window streams") {
    assert(Multimodal.videoTemporalHash64("not a y4m".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.videoTemporalHash64(Multimodal.blockPng("img")).isEmpty,
      "a PNG is not a Y4M — no fake fingerprints for other media")
    assert(Multimodal.videoTemporalHash64(Multimodal.blockWav("aud")).isEmpty,
      "a WAV is not a Y4M either")
    // a decodable clip below the 65-frame floor is rejected, not hashed
    val short = {
      val header = "YUV4MPEG2 W4 H2 F25:1 Cmono\n".getBytes("US-ASCII")
      val marker = "FRAME\n".getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(header.length + 3 * (marker.length + 8))
      bb.put(header)
      for (_ <- 0 until 3) { bb.put(marker); for (_ <- 0 until 8) bb.put(100.toByte) }
      bb.array()
    }
    assert(Multimodal.decodeY4m(short).isDefined, "the clip itself decodes")
    assert(Multimodal.videoTemporalHash64(short).isEmpty, "but is below the 65-frame floor")
  }

  test("multi-frame windows: the mean is over every pixel of every frame in the window") {
    // 130 frames -> wLen = 2: window w averages frames 2w and 2w+1. Build a
    // clip whose per-frame levels make window means differ from any single
    // frame's level, and check the hash against a hand-rolled computation.
    val header = "YUV4MPEG2 W4 H2 F25:1 Cmono\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val nFrames = 130
    val levels = (0 until nFrames).map(f => 40 + (f * 37) % 120)
    val bb = java.nio.ByteBuffer.allocate(header.length + nFrames * (marker.length + 8))
    bb.put(header)
    levels.foreach { lv =>
      bb.put(marker); for (_ <- 0 until 8) bb.put(lv.toByte)
    }
    val clip = bb.array()
    val energies = (0 until 65).map(w => (levels(2 * w) * 8L + levels(2 * w + 1) * 8L) / 16L)
    var expected = 0L
    for (b <- 0 until 64) if (energies(b) < energies(b + 1)) expected |= 1L << b
    assert(Multimodal.videoTemporalHash64(clip).get === expected)
  }

  test("banded pipeline finds exactly the planted video pairs; nulls excluded") {
    val rows = Seq(
      (1L, Multimodal.blockY4m("a")),
      (101L, Multimodal.blockY4m("a", levelDelta = 8)),
      (2L, Multimodal.blockY4m("b")),
      (102L, Multimodal.blockY4m("b", bumpFrame = Some(30))),
      (3L, Multimodal.blockY4m("c")),
      (4L, "junk bytes".getBytes("UTF-8")))
    val df = rows.toDF("vid_id", "media")
    val pairs = ImageDedup.dHashPairs(
        Multimodal.videoTemporalHashes(df, "vid_id"), "vid_id",
        bands = 4, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 101L), (2L, 102L)))
  }

  test("sharedFramePairs: exact shared frames, internal repeats count once, cap excludes boilerplate") {
    def plane(seed: Int): Array[Byte] = Array.tabulate(64)(i => ((seed * 31 + i) % 251).toByte)
    // A and B share frames 1,2; A repeats frame 1 internally (counts once);
    // C is disjoint; frame 9 appears in A, B, C and D -> df 4 > cap 3, excluded.
    val boiler = plane(9)
    val clips = Seq(
      (1L, Multimodal.frameY4m(Seq(plane(1), plane(2), plane(2), plane(3), boiler))),
      (2L, Multimodal.frameY4m(Seq(plane(1), plane(2), plane(5), boiler))),
      (3L, Multimodal.frameY4m(Seq(plane(6), plane(7), boiler))),
      (4L, Multimodal.frameY4m(Seq(plane(8), boiler))))
      .toDF("vid_id", "media")
    val frames = Multimodal.sampleFrames(clips, "vid_id")
    val pairs = ImageDedup.sharedFramePairs(frames, "vid_id", maxClipsPerFrame = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 2L)),
      "A-B share planes 1 and 2 exactly once each; the 4-clip boilerplate frame is capped out")
    // with a generous cap the boilerplate frame links everything
    val uncapped = ImageDedup.sharedFramePairs(frames, "vid_id", maxClipsPerFrame = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped === Set((1L, 2L, 3L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("syntheticFrameY4ms plants exactly the 3-frame shared intros") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val clips = Multimodal.syntheticFrameY4ms(ids, "doc_id")
    assert(clips.count() === 63)
    val frames = Multimodal.sampleFrames(clips, "vid_id")
    assert(frames.count() === 63L * 12L, "every clip decodes to its 12 frames")
    val pairs = ImageDedup.sharedFramePairs(frames, "vid_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 10000000L, 3L), (20L, 10000020L, 3L), (40L, 10000040L, 3L)))
  }

  test("syntheticBlockY4ms plants twins by id arithmetic with real container round-trips") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val clips = Multimodal.syntheticBlockY4ms(ids, "doc_id")
    assert(clips.count() === 63)
    val hashes = Multimodal.videoTemporalHashes(clips, "vid_id")
    assert(hashes.filter(col("dhash").isNull).count() === 0,
      "every synthetic clip is a decodable mono Y4M")
    val pairs = ImageDedup.dHashPairs(hashes, "vid_id", bands = 4, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 10000000L), (20L, 10000020L), (40L, 10000040L)))
  }
}
