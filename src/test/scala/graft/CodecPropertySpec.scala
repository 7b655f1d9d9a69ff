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
