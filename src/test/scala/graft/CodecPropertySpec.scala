package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.multimodal.Multimodal

/** Property fuzzing for the real codec trio (WAV/BMP/AVI): random
  * payloads round-trip build → decode EXACTLY across the edge shapes
  * the fixed specs can't enumerate — every stride remainder (width %
  * 4 ∈ 0..3), odd/even PCM sizes, 1×1 rasters, single- and
  * multi-frame clips, extreme sample values. Deterministic seeds, no
  * Spark involvement: the codecs are plain functions.
  */
class CodecPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, Seed(seed))

  test("WAV PCM16 round-trips exactly for random rates, channels, " +
    "lengths (odd and even) and full-range samples") {
    val gen = for {
      rate <- Gen.choose(1, 192000)
      ch <- Gen.choose(1, 4)
      n <- Gen.choose(0, 300)
      samples <- Gen.listOfN(n, Gen.choose(-32768, 32767))
      junk <- Gen.oneOf(true, false)
    } yield (rate, ch, samples.toArray, junk)
    (0 until 120).foreach { i =>
      val (rate, ch, samples, junk) = draw(gen, 1000L + i)
      val clip = Multimodal.decodeWav(
        Multimodal.buildWavPcm16(rate, ch, samples, junk))
      assert(clip.sample_rate == rate && clip.channels == ch &&
        clip.bits_per_sample == 16, s"case $i header")
      assert(clip.samples.toSeq == samples.toSeq, s"case $i samples")
    }
  }

  test("WAV PCM8 round-trips exactly, including odd data sizes") {
    val gen = for {
      rate <- Gen.choose(1, 96000)
      n <- Gen.choose(0, 301)
      samples <- Gen.listOfN(n, Gen.choose(-128, 127))
    } yield (rate, samples.toArray)
    (0 until 120).foreach { i =>
      val (rate, samples) = draw(gen, 2000L + i)
      val clip = Multimodal.decodeWav(
        Multimodal.buildWavPcm8(rate, 1, samples))
      assert(clip.bits_per_sample == 8 &&
        clip.samples.toSeq == samples.toSeq, s"case $i")
    }
  }

  test("G.711: expand/compress are exact inverses over all 256 " +
    "codewords (µ-law's dual zero excepted), and the WAV container " +
    "round-trips random codeword streams through both laws") {
    // table-level: decode-then-encode returns the codeword — the
    // standard G.711 identity. µ-law has TWO zero codes (0xFF = +0,
    // 0x7F = −0); −0 decodes to 0, which re-encodes as +0 — the one
    // documented exception.
    (0 until 256).foreach { c =>
      val u = Multimodal.ulawExpand(c)
      assert(u >= -32124 && u <= 32124, s"ulaw($c) out of range: $u")
      if (c != 0x7f)
        assert(Multimodal.ulawCompress(u) == c, s"ulaw roundtrip $c")
    }
    assert(Multimodal.ulawExpand(0x7f) == 0 &&
      Multimodal.ulawCompress(0) == 0xff)
    (0 until 256).foreach { c =>
      val a = Multimodal.alawExpand(c)
      assert(a >= -32256 && a <= 32256, s"alaw($c) out of range: $a")
      assert(Multimodal.alawCompress(a) == c, s"alaw roundtrip $c")
    }
    // container-level: random codeword streams through the full
    // build → RIFF walk → expand path, both laws, odd/even sizes
    val gen = for {
      rate <- Gen.choose(1, 48000)
      n <- Gen.choose(0, 301)
      codes <- Gen.listOfN(n, Gen.choose(0, 255))
      mu <- Gen.oneOf(true, false)
    } yield (rate, codes.toArray, mu)
    (0 until 120).foreach { i =>
      val (rate, codes, mu) = draw(gen, 7000L + i)
      val clip = Multimodal.decodeWav(
        Multimodal.buildWavG711(rate, 1, codes, mulaw = mu))
      assert(clip.sample_rate == rate && clip.bits_per_sample == 8 &&
        clip.format_tag == (if (mu) 7 else 6), s"case $i header")
      val expect = codes.map(c =>
        if (mu) Multimodal.ulawExpand(c) else Multimodal.alawExpand(c))
      assert(clip.samples.toSeq == expect.toSeq, s"case $i samples")
    }
    // hostile stream: a G.711 format tag with a non-8-bit width
    val bad = Multimodal.buildWavG711(8000, 1, Array(1, 2, 3),
      mulaw = true).clone()
    // fmt body starts at offset 20; bits-per-sample is at +14 → 34
    bad(34) = 16.toByte
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    assert(e.getMessage.contains("8-bit"), e.getMessage)
  }

  // Independent IMA ADPCM reference decoder, written directly from
  // the public spec with its OWN copy of the tables — the round-trip
  // fuzz asserts Multimodal's decode against this, not against
  // itself. Emits each block's header predictor plus every
  // post-nibble predictor (the tag-17 emission contract).
  private val refStep = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)
  private def refAdpcm(nibbles: Array[Int], initIndex: Int,
      perBlock: Int): Array[Int] = {
    var pred = 0
    var idx = initIndex
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    nibbles.zipWithIndex.foreach { case (n, j) =>
      if (j % perBlock == 0) out += pred // block header sample
      val step = refStep(idx)
      var d = step >> 3
      if ((n & 1) != 0) d += step >> 2
      if ((n & 2) != 0) d += step >> 1
      if ((n & 4) != 0) d += step
      pred = math.max(-32768,
        math.min(32767, if ((n & 8) != 0) pred - d else pred + d))
      idx = math.max(0, math.min(88,
        idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(n & 7)))
      out += pred
    }
    out.toArray
  }

  test("IMA ADPCM: decode of encode matches the independent " +
    "reference decoder (lossy codec — reconstruction parity, not " +
    "identity), random block sizes and step-index starts") {
    val gen = for {
      rate <- Gen.choose(1, 48000)
      perBlockHalf <- Gen.choose(1, 40) // bytes of nibbles per block
      blocks <- Gen.choose(1, 6)
      initIdx <- Gen.choose(0, 88)
      n = perBlockHalf * 2 * blocks
      samples <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield (rate, perBlockHalf * 2, initIdx, samples.toArray)
    (0 until 120).foreach { i =>
      val (rate, perBlock, initIdx, samples) = draw(gen, 9000L + i)
      val nibbles = Multimodal.adpcmEncode(samples, initIdx)
      val blockAlign = perBlock / 2 + 4
      val wav = Multimodal.buildWavAdpcm(rate, nibbles, blockAlign,
        initIdx)
      val clip = Multimodal.decodeWav(wav)
      assert(clip.sample_rate == rate && clip.bits_per_sample == 4 &&
        clip.format_tag == 0x11 && clip.channels == 1, s"case $i header")
      val expect = refAdpcm(nibbles, initIdx, perBlock)
      assert(clip.samples.toSeq == expect.toSeq, s"case $i samples")
    }
    // lossy-quality guard on a signal the codec is FOR: a slow ramp
    // (≤64/sample slope — well inside the adaptive stepper's range)
    // must reconstruct within a small bound once the stepper locks
    // on. Random noise can't bound error (any 4-bit DPCM is allowed
    // to be wildly wrong there); a tracked smooth signal can.
    val ramp = Array.tabulate(512)(k => -16000 + k * 63)
    val nr = Multimodal.adpcmEncode(ramp, 0)
    val clip = Multimodal.decodeWav(
      Multimodal.buildWavAdpcm(8000, nr, blockAlign = 20, initIndex = 0))
    val rec = clip.samples
    (64 until 512).foreach { k =>
      val v = rec(k + k / 32 + 1) // skip the interleaved header samples
      assert(math.abs(v - ramp(k)) <= 256,
        s"ramp sample $k: ${ramp(k)} vs $v")
    }
  }

  test("IMA ADPCM hostile streams fail by name: bad block align, " +
    "truncated block, out-of-range step index, stereo, bad width, " +
    "partial final block") {
    val good = Multimodal.buildWavAdpcm(8000,
      Array.fill(64)(5), blockAlign = 20, initIndex = 30)
    // fmt body at 20: blockAlign LE16 at +12 (=32), bits at +14 (=34),
    // channels at +2 (=22), samplesPerBlock at +18 (=38); data body
    // starts at 48, block header: pred 48..49, step index 50
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(off) = v.toByte; b
    }
    val eAlign = intercept[IllegalArgumentException](
      Multimodal.decodeWav(patched(32, 3)))
    assert(eAlign.getMessage.contains("block align"), eAlign.getMessage)
    val eTrunc = intercept[IllegalArgumentException](
      Multimodal.decodeWav {
        val b = good.clone()
        // shrink the data chunk's declared size by one byte → the
        // walker sees a final partial block
        val dszOff = 44
        val old = (b(dszOff) & 0xff) | ((b(dszOff + 1) & 0xff) << 8)
        b(dszOff) = ((old - 1) & 0xff).toByte
        b
      })
    assert(eTrunc.getMessage.contains("truncated"), eTrunc.getMessage)
    val eIdx = intercept[IllegalArgumentException](
      Multimodal.decodeWav(patched(50, 89)))
    assert(eIdx.getMessage.contains("step index"), eIdx.getMessage)
    val eCh = intercept[IllegalArgumentException](
      Multimodal.decodeWav(patched(22, 2)))
    assert(eCh.getMessage.contains("mono"), eCh.getMessage)
    val eBits = intercept[IllegalArgumentException](
      Multimodal.decodeWav(patched(34, 8)))
    assert(eBits.getMessage.contains("4-bit"), eBits.getMessage)
    val eSpb = intercept[IllegalArgumentException](
      Multimodal.decodeWav(patched(38, 12)))
    assert(eSpb.getMessage.contains("samples per block"), eSpb.getMessage)
    // builder refuses a partial final block rather than zero-padding
    val eBuild = intercept[IllegalArgumentException](
      Multimodal.buildWavAdpcm(8000, Array.fill(33)(1), 20, 0))
    assert(eBuild.getMessage.contains("multiple"), eBuild.getMessage)
  }

  test("BMP round-trips exactly for every stride remainder " +
    "(width 1..17) and random heights incl. 1x1") {
    val gen = for {
      w <- Gen.choose(1, 17)
      h <- Gen.choose(1, 9)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, px.toArray)
    (0 until 150).foreach { i =>
      val (w, h, px) = draw(gen, 3000L + i)
      val img = Multimodal.decodeBmp(Multimodal.buildBmpGray8(w, px))
      assert(img.width == w && img.height == h, s"case $i dims")
      assert(img.pixels.toSeq == px.toSeq, s"case $i raster w=$w h=$h")
    }
  }

  test("BI_RLE8 BMP round-trips exactly: random rasters (runs vs " +
    "literal noise), every width remainder, 1x1, flat images") {
    // mix run-heavy and noisy rows so encoded runs, single-pixel
    // pairs AND absolute (literal) runs all sit on the decode path
    val gen = for {
      w <- Gen.choose(1, 33)
      h <- Gen.choose(1, 9)
      flat <- Gen.choose(0, 3) // 0 → constant raster
      px <- if (flat == 0) Gen.choose(0, 255).map(v =>
          List.fill(w * h)(v))
        else Gen.listOfN(w * h, Gen.frequency(
          3 -> Gen.const(7), 2 -> Gen.choose(0, 255)))
    } yield (w, h, px.toArray)
    (0 until 150).foreach { i =>
      val (w, h, px) = draw(gen, 7000L + i)
      val img = Multimodal.decodeBmp(Multimodal.buildBmpRle8(w, px))
      assert(img.width == w && img.height == h, s"case $i dims")
      assert(img.pixels.toSeq == px.toSeq, s"case $i raster w=$w h=$h")
    }
  }

  test("AVI round-trips exactly for random dims and frame counts, " +
    "with and without the odd-size JUNK chunk") {
    val gen = for {
      w <- Gen.choose(1, 13)
      h <- Gen.choose(1, 6)
      nf <- Gen.choose(0, 7)
      frames <- Gen.listOfN(nf,
        Gen.listOfN(w * h, Gen.choose(0, 255)).map(_.toArray))
      junk <- Gen.oneOf(true, false)
    } yield (w, h, frames, junk)
    (0 until 120).foreach { i =>
      val (w, h, frames, junk) = draw(gen, 4000L + i)
      val clip = Multimodal.decodeAvi(
        Multimodal.buildAviGray8(w, h, frames, junk))
      assert(clip.width == w && clip.height == h, s"case $i dims")
      assert(clip.frames.length == frames.length, s"case $i count")
      clip.frames.zip(frames).zipWithIndex.foreach { case ((g, e), f) =>
        assert(g.toSeq == e.toSeq, s"case $i frame $f w=$w h=$h")
      }
    }
  }
}
