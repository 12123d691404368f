package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The subset-FLAC codec: lossless round trip, CRC honesty (corruption
  * -> None, never garbage samples), out-of-subset rejection, and the
  * cross-container fingerprint equality that q_flacdedup's planted pairs
  * rest on.
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Short], rate: Int = 8000,
      blockSize: Int = 1024): Unit = {
    val enc = Flac.encodeFlacFixed(samples, rate, blockSize)
    val dec = Flac.decodeFlac(enc)
    assert(dec.isDefined, "decode failed")
    val m = dec.get
    assert(m.sampleRateHz === rate)
    assert(m.nChannels === 1)
    assert(m.bitsPerSample === 16)
    assert(m.samples.length === samples.length)
    assert(m.samples.toSeq === samples.map(_.toInt).toSeq, "lossless round trip")
  }

  test("round trip: ramps, extremes, constants, and a short last frame") {
    // ramp crossing zero, both 16-bit extremes, long constant stretch,
    // and a length NOT divisible by the block size (short final frame)
    val s = (Array.tabulate(3000)(i => (i * 23 - 30000).toShort)
      ++ Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1)
      ++ Array.fill(500)(1234.toShort))
    roundTrip(s)
    roundTrip(s, blockSize = 192)
    // a pure square wave (the planted-corpus shape)
    roundTrip(Array.tabulate(65 * 64)(i => if ((i & 1) == 0) 9000.toShort else (-9000).toShort))
  }

  test("compression is real: the square-wave corpus encodes below PCM size") {
    val samples = Array.tabulate(65 * 64)(i => if ((i & 1) == 0) 8192.toShort else (-8192).toShort)
    val enc = Flac.encodeFlacFixed(samples, 8000)
    assert(enc.length < samples.length * 2,
      s"FLAC ${enc.length} bytes should undercut ${samples.length * 2} PCM bytes")
  }

  test("a corrupted byte fails the CRC loudly (None, never wrong samples)") {
    val samples = Array.tabulate(4096)(i => (math.sin(i / 10.0) * 20000).toShort)
    val enc = Flac.encodeFlacFixed(samples, 8000)
    assert(Flac.decodeFlac(enc).isDefined)
    // flip a bit mid-stream (inside frame data, past the headers)
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x10).toByte
    assert(Flac.decodeFlac(bad).isEmpty, "corruption must not decode")
    // truncation must not decode either
    assert(Flac.decodeFlac(enc.dropRight(3)).isEmpty)
    assert(Flac.decodeFlac("fLaC".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decodeFlac("not flac at all".getBytes("US-ASCII")).isEmpty)
  }

  test("out-of-subset / inconsistent streams are rejected -> None") {
    val enc = Flac.encodeFlacFixed(Array.fill[Short](2048)(100), 8000)
    // STREAMINFO channels-1 lives in bits 3-1 of byte 4+4+12 = 20
    val threeCh = enc.clone()
    threeCh(20) = (threeCh(20) | 0x04).toByte // channels-1 = 2 -> 3 channels
    assert(Flac.decodeFlac(threeCh).isEmpty, "3+ channels are out of subset")
    // STREAMINFO claiming stereo over mono-framed content: inconsistent
    val mismatched = enc.clone()
    mismatched(20) = (mismatched(20) | 0x02).toByte // claims 2 channels
    assert(Flac.decodeFlac(mismatched).isEmpty,
      "frame channel layout must match STREAMINFO")
  }

  test("LPC subframes decode losslessly (genuinely-LPC streams)") {
    val s = Array.tabulate(5000)(i =>
      ((math.sin(i / 7.0) * 15000) + (i % 13) * 100 - 600).toShort)
    // order-2 LPC with arbitrary quantized coefficients: the prediction
    // is subtracted and re-added exactly, so ANY coefs round-trip
    val enc = Flac.encodeFlacLpc(s, 8000, coefs = Array(1900, -850), shift = 10)
    val dec = Flac.decodeFlac(enc)
    assert(dec.isDefined, "LPC decode failed")
    assert(dec.get.samples.toSeq === s.map(_.toInt).toSeq)
    // higher order + different precision/shift
    val enc2 = Flac.encodeFlacLpc(s, 8000,
      coefs = Array(700, -300, 120, -40), shift = 9, precision = 11)
    assert(Flac.decodeFlac(enc2).get.samples.toSeq === s.map(_.toInt).toSeq)
    // an LPC stream compresses the sine-ish signal below raw PCM
    assert(enc.length < s.length * 2)
  }

  test("stereo decodes losslessly in every channel mode, interleaved L,R") {
    val n = 3000
    val left = Array.tabulate(n)(i => (math.sin(i / 11.0) * 12000).toShort)
    val right = Array.tabulate(n)(i => ((math.sin(i / 11.0) * 12000) * 0.7 + 500).toShort)
    for (mode <- Seq("lr", "ls", "rs", "ms")) {
      val dec = Flac.decodeFlac(Flac.encodeFlacStereo(left, right, 8000, mode))
      assert(dec.isDefined, s"mode $mode failed to decode")
      val m = dec.get
      assert(m.nChannels === 2, mode)
      assert(m.samples.length === 2 * n, mode)
      val gotL = (0 until n).map(i => m.samples(2 * i))
      val gotR = (0 until n).map(i => m.samples(2 * i + 1))
      assert(gotL === left.map(_.toInt).toSeq, s"$mode left channel")
      assert(gotR === right.map(_.toInt).toSeq, s"$mode right channel")
    }
    // extreme values through the decorrelated side channel (17 bits)
    val lx = Array[Short](Short.MaxValue, Short.MinValue, 0, 1000)
    val rx = Array[Short](Short.MinValue, Short.MaxValue, -1, -1000)
    for (mode <- Seq("ls", "rs", "ms")) {
      val m = Flac.decodeFlac(Flac.encodeFlacStereo(lx, rx, 8000, mode)).get
      assert((0 until 4).map(i => m.samples(2 * i)) === lx.map(_.toInt).toSeq, mode)
      assert((0 until 4).map(i => m.samples(2 * i + 1)) === rx.map(_.toInt).toSeq, mode)
    }
    // a stereo stream never fakes a mono fingerprint (honesty contract)
    assert(Multimodal.flacEnergyHash64(
      Flac.encodeFlacStereo(left, right, 8000, "ms")).isEmpty)
  }

  test("cross-container fingerprint equality: blockFlac hash == blockWav hash") {
    val wavHash = Multimodal.audioEnergyHash64(Multimodal.blockWav("xc|1"))
    val flacHash = Multimodal.flacEnergyHash64(Multimodal.blockFlac("xc|1"))
    assert(wavHash.isDefined && flacHash.isDefined)
    assert(wavHash === flacHash,
      "identical PCM must fingerprint identically through either container")
    // and the level-shift twin stays hamming 0 across containers
    val twin = Multimodal.audioEnergyHash64(
      Multimodal.blockWav("xc|1", levelDelta = 8))
    assert(twin === flacHash)
    // a FLAC payload is NOT mistaken for WAV (container routing)
    assert(Multimodal.audioEnergyHash64(Multimodal.blockFlac("xc|1")).isEmpty)
    assert(Multimodal.decode(Multimodal.blockFlac("xc|1")).getString(0) === "audio/flac")
  }
}
