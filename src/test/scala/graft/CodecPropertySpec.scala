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
