package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties for the FLAC codec — the shapes the hand-built
  * fixtures don't reach: arbitrary PCM must round-trip bit-exactly
  * through every encoder (FIXED, LPC with random coefficients, all four
  * stereo modes, odd lengths, tiny and large block sizes), and random
  * single-byte corruptions of a valid stream must TERMINATE in None or
  * a successful decode — never hang, never throw (CRC-16 catches every
  * burst ≤ 16 bits inside a frame; mutations in the un-CRC'd metadata
  * may legally still decode).
  */
class FlacPropertySpec extends AnyFunSuite {

  private def randomPcm(rnd: scala.util.Random, n: Int): Array[Short] =
    Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)

  test("random PCM round-trips bit-exactly: FIXED, odd lengths, block sizes") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(4000)
      val blockSize = Seq(192, 256, 1024, 4096)(rnd.nextInt(4))
      val s = randomPcm(rnd, n)
      val dec = Flac.decodeFlac(Flac.encodeFlacFixed(s, 8000, blockSize))
      assert(dec.isDefined, s"trial $trial n=$n bs=$blockSize")
      assert(dec.get.samples.toSeq === s.map(_.toInt).toSeq,
        s"trial $trial n=$n bs=$blockSize")
    }
  }

  test("random PCM round-trips through LPC with random coefficients") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(3000)
      val order = 1 + rnd.nextInt(6)
      val precision = 4 + rnd.nextInt(11) // 4..14
      val shift = rnd.nextInt(15)
      val half = 1 << (precision - 1)
      val coefs = Array.fill(order)(rnd.nextInt(2 * half) - half)
      val s = randomPcm(rnd, n)
      val dec = Flac.decodeFlac(Flac.encodeFlacLpc(s, 8000, coefs, shift, precision))
      assert(dec.isDefined, s"trial $trial order=$order p=$precision sh=$shift")
      assert(dec.get.samples.toSeq === s.map(_.toInt).toSeq, s"trial $trial")
    }
  }

  test("random stereo PCM round-trips through every channel mode") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(2500)
      val mode = Seq("lr", "ls", "rs", "ms")(rnd.nextInt(4))
      val l = randomPcm(rnd, n)
      val r = randomPcm(rnd, n)
      val dec = Flac.decodeFlac(Flac.encodeFlacStereo(l, r, 8000, mode))
      assert(dec.isDefined, s"trial $trial mode=$mode n=$n")
      val m = dec.get
      assert((0 until n).forall(i => m.samples(2 * i) == l(i).toInt),
        s"trial $trial mode=$mode left")
      assert((0 until n).forall(i => m.samples(2 * i + 1) == r(i).toInt),
        s"trial $trial mode=$mode right")
    }
  }

  test("fuzz: random byte corruptions terminate in None or a valid decode") {
    val rnd = new scala.util.Random(53)
    val base = Flac.encodeFlacStereo(randomPcm(rnd, 1500), randomPcm(rnd, 1500),
      8000, "ms")
    val mono = Flac.encodeFlacLpc(randomPcm(rnd, 1500), 8000, Array(1024), 10)
    var frameDataFlips = 0
    var frameDataDecoded = 0
    for (stream <- Seq(base, mono); _ <- 1 to 150) {
      val bad = stream.clone()
      val pos = rnd.nextInt(bad.length)
      bad(pos) = (bad(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = Flac.decodeFlac(bad) // must return, never throw/hang
      // a flip INSIDE frame bytes is a burst <= 8 bits: CRC-16 always
      // catches it, so a successful decode from there is a soundness bug
      if (pos >= 42) { // past fLaC + STREAMINFO
        frameDataFlips += 1
        if (out.isDefined) frameDataDecoded += 1
      }
    }
    assert(frameDataFlips > 100, "fuzz must actually hit frame data")
    assert(frameDataDecoded === 0,
      "a single-byte frame corruption must never decode (CRC-16 burst guarantee)")
  }
}
