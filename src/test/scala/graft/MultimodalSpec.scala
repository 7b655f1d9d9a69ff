package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def rec(id: Long, kind: String, payload: String) =
    MediaRecord(id, kind, "raw", payload.getBytes("UTF-8"))

  test("media table carries opaque binary + typed metadata") {
    val docs = Seq((0L, "hello world"), (1L, "beep"), (2L, "movie bytes"))
      .toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(m.toSet == Set((0L, "image", "png"), (1L, "audio", "wav"),
      (2L, "video", "mp4")))
    val bytes = Multimodal.mediaFromDocuments(docs)
      .filter(col("media_id") === 0L).select("content").collect()(0)
      .getAs[Array[Byte]](0)
    assert(new String(bytes, "UTF-8") == "hello world")
  }

  test("imageFeatures: exact counts over stub-decoded pixels") {
    val ds = Seq(rec(1, "image", "abc")).toDS()
    val f = Multimodal.imageFeatures(ds).collect()(0)
    assert(f == ImageFeatures(1, 3, 1, 3, 'a' + 'b' + 'c', 'a', 'c'))
  }

  test("resize stride-4 keeps pixels at 0,4,8,...") {
    val ds = Seq(rec(1, "image", "abcdefgh")).toDS()
    val f = Multimodal.resizedFeatures(ds, 4).collect()(0)
    assert(f.n_pixels == 2 && f.sum_pixel == ('a' + 'e').toLong)
  }

  test("frame sampling takes every 2nd 16-byte frame with stable hash") {
    val payload = "x" * 40 // frames: 16,16,8 → sampled: 0 and 2
    val fr = Multimodal.sampleFrames(Seq(rec(1, "video", payload)).toDS(),
      16, 2).collect().sortBy(_.frame_no)
    assert(fr.map(_.frame_no).toSeq == Seq(0, 2))
    assert(fr.map(_.n_bytes).toSeq == Seq(16, 8))
    val M = 1000000007L
    val exp0 = (1 to 16).foldLeft(0L)((h, _) => (h * 31 + 'x') % M)
    assert(fr(0).frame_hash == exp0)
  }

  test("audio energy windows are exact integer sums of squares") {
    val ds = Seq(rec(1, "audio", "aA")).toDS() // 97-128=-31, 65-128=-63
    val w = Multimodal.audioEnergy(ds, 32).collect()(0)
    assert(w == AudioWindow(1, 0, 31L * 31 + 63L * 63, 2))
  }

  test("blockMeanHash: identical content hashes equal, one byte flips few bits") {
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val tweaked = "X" + base.substring(1)
    val ds = Seq((1L, base.getBytes("UTF-8")),
      (2L, base.getBytes("UTF-8")),
      (3L, tweaked.getBytes("UTF-8"))).toDS()
    val h = Multimodal.blockMeanHash(ds).collect().toMap
    assert(h(1L) == h(2L)) // determinism / exact dup
    assert((h(1L) & ~((1L << 60) - 1)) == 0L) // 60-bit lane
    val dist = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(dist >= 0 && dist <= 6, s"one-byte edit flipped $dist bits")
    // recompute doc 3 by hand with the exact integer rule
    val px = tweaked.getBytes("UTF-8").map(_ & 0xff)
    val n = px.length.toLong
    val bs = new Array[Long](60); val bn = new Array[Long](60)
    var ts = 0L
    px.zipWithIndex.foreach { case (p, i) =>
      val b = ((i.toLong * 60) / n).toInt; bs(b) += p; bn(b) += 1; ts += p
    }
    val exp = (0 until 60).foldLeft(0L) { (acc, b) =>
      if (bs(b) * n > ts * bn(b)) acc | (1L << b) else acc
    }
    assert(h(3L) == exp)
  }

  test("frameFeatures: per-frame sum/min/max/hash over sampled frames") {
    val payload = "abcz" * 9 // 36 bytes → frames 16,16,4 → sampled 0, 2
    val fr = Multimodal.frameFeatures(Seq(rec(1, "video", payload)).toDS(),
      16, 2).collect().sortBy(_.frame_no)
    assert(fr.map(_.frame_no).toSeq == Seq(0, 2))
    val bytes = payload.getBytes("UTF-8").map(_ & 0xff)
    val f2 = bytes.slice(32, 36)
    assert(fr(1).fsum == f2.map(_.toLong).sum)
    assert(fr(1).fmin == f2.min && fr(1).fmax == f2.max)
    val M = 1000000007L
    assert(fr(1).fhash == f2.foldLeft(0L)((h, b) => (h * 31 + b) % M))
  }

  test("decodeWav: real RIFF walker round-trips PCM16 exactly, " +
    "including the odd-size JUNK chunk's pad byte") {
    val samples = Array(3, -2, 1000, -32768, 32767, 0)
    val wav = Multimodal.buildWavPcm16(44100, 1, samples,
      junkChunk = true)
    val clip = Multimodal.decodeWav(wav)
    assert(clip.sample_rate == 44100 && clip.channels == 1 &&
      clip.bits_per_sample == 16)
    assert(clip.samples.toSeq == samples.toSeq)
    // header fields land at spec offsets: RIFF size covers everything
    def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    assert(le32(wav, 4) == wav.length - 8)
    // without the JUNK chunk the payload is the canonical 44-byte
    // header + data
    val plain = Multimodal.buildWavPcm16(8000, 1, samples)
    assert(plain.length == 44 + samples.length * 2)
    assert(Multimodal.decodeWav(plain).samples.toSeq == samples.toSeq)
  }

  test("decodeWav: 8-bit unsigned PCM decodes offset-128 centered") {
    val samples = Array(-128, -1, 0, 1, 127)
    val wav = Multimodal.buildWavPcm8(16000, 1, samples)
    val clip = Multimodal.decodeWav(wav)
    assert(clip.bits_per_sample == 8 && clip.sample_rate == 16000)
    assert(clip.samples.toSeq == samples.toSeq)
  }

  test("decodeWav: stereo PCM16 keeps interleaved samples; " +
    "non-RIFF and non-PCM payloads are rejected by name") {
    val inter = Array(1, -1, 2, -2) // L R L R
    val clip = Multimodal.decodeWav(
      Multimodal.buildWavPcm16(22050, 2, inter))
    assert(clip.channels == 2 && clip.samples.toSeq == inter.toSeq)
    val bad = intercept[IllegalArgumentException](
      Multimodal.decodeWav("not audio at all".getBytes("US-ASCII")))
    assert(bad.getMessage.contains("RIFF"))
    // flip the fmt tag to 3 (IEEE float) — rejected as non-PCM
    val wav = Multimodal.buildWavPcm16(8000, 1, Array(1, 2, 3))
    wav(20) = 3
    val nonPcm = intercept[IllegalArgumentException](
      Multimodal.decodeWav(wav))
    assert(nonPcm.getMessage.contains("PCM"))
  }

  test("audioEnergyWav: q375 contract — windowed energy over REAL " +
    "decoded samples matches the direct recompute") {
    val text = "the quick brown fox jumps over the lazy dog padding!"
    val samples = text.map(ch => (ch.toInt - 80) * 200).toArray
    val ds = Seq(MediaRecord(7L, "audio", "wav",
      Multimodal.buildWavPcm16(12000, 1, samples, junkChunk = true)))
      .toDS()
    val got = Multimodal.audioEnergyWav(ds, 32).collect()
      .sortBy(_.window_no)
    val want = samples.grouped(32).zipWithIndex.map { case (w, i) =>
      AudioWindowSr(7L, i, w.map(s => s.toLong * s).sum, w.length,
        12000)
    }.toSeq
    assert(got.toSeq == want)
  }

  test("decodeBmp: real DIB parser round-trips an 8-bit raster " +
    "exactly through the stride padding and bottom-up row order") {
    // width 5 -> stride 8 (3 pad bytes per row, load-bearing)
    val px = Array.tabulate(5 * 3)(i => (i * 17) % 256)
    val bmp = Multimodal.buildBmpGray8(5, px)
    val img = Multimodal.decodeBmp(bmp)
    assert(img.width == 5 && img.height == 3)
    assert(img.pixels.toSeq == px.toSeq)
    // the payload really is padded: 14 + 40 + 1024 + 8*3
    assert(bmp.length == 14 + 40 + 1024 + 8 * 3)
  }

  test("decodeBmp: negative height means top-down rows; a positive " +
    "one is bottom-up (the builder's order is proven by a flip)") {
    val px = Array.tabulate(4 * 2)(identity) // width 4: zero padding
    val bmp = Multimodal.buildBmpGray8(4, px)
    // flip the height sign in BITMAPINFOHEADER (offset 22, le32):
    // the parser must now read rows top-down, i.e. reversed rows
    val flipped = bmp.clone()
    val h = -2
    flipped(22) = (h & 0xff).toByte
    flipped(23) = ((h >> 8) & 0xff).toByte
    flipped(24) = ((h >> 16) & 0xff).toByte
    flipped(25) = ((h >> 24) & 0xff).toByte
    val img = Multimodal.decodeBmp(flipped)
    assert(img.pixels.toSeq ==
      (px.slice(4, 8) ++ px.slice(0, 4)).toSeq)
  }

  test("decodeBmp: rejects non-BMP, non-8-bit and compressed " +
    "payloads with named errors") {
    val good = Multimodal.buildBmpGray8(4, Array.fill(8)(1))
    val notBmp = intercept[IllegalArgumentException](
      Multimodal.decodeBmp("RIFFxxxxWAVE".getBytes("US-ASCII") ++
        Array.fill[Byte](60)(0)))
    assert(notBmp.getMessage.contains("BMP"))
    val bpp = good.clone(); bpp(28) = 24 // claim 24-bit
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeBmp(bpp)).getMessage.contains("bpp"))
    val comp = good.clone(); comp(30) = 2 // claim BI_RLE4
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeBmp(comp)).getMessage
        .contains("unsupported compression"))
  }

  test("decodeBmp BI_RLE8: runs + absolute stretches round-trip; " +
    "delta and end-of-line escapes decode per spec") {
    // builder round-trip: run-heavy rows exercise encoded pairs,
    // noisy rows exercise absolute (literal) runs with the WORD pad
    val w = 30
    val px = Array.tabulate(w * 5)(i =>
      if ((i / 7) % 3 == 0) 40 else (i * 13) % 256)
    val img = Multimodal.decodeBmp(Multimodal.buildBmpRle8(w, px))
    assert(img.width == w && img.height == 5)
    assert(img.pixels.toSeq == px.toSeq)
    // hand-built stream on a 4x2 raster: encoded run, delta skip
    // (skipped pixels read 0), end-of-line, end-of-bitmap
    val base = Multimodal.buildBmpGray8(4, Array.fill(8)(9))
    val rle = base.clone()
    rle(30) = 1 // BI_RLE8
    val dataOff = 14 + 40 + 256 * 4
    val stream = Array[Byte](2, 5, 0, 2, 1, 1, 0, 1)
    System.arraycopy(stream, 0, rle, dataOff, stream.length)
    val d = Multimodal.decodeBmp(rle)
    // bottom row: run 2×5 then delta(1,1) jumps away; top row: zeros
    assert(d.pixels.toSeq == Seq(0, 0, 0, 0, 5, 5, 0, 0))
  }

  test("decodeBmp BI_RLE8: hostile streams get named errors — run " +
    "past the row end, truncated stream, top-down refusal") {
    val base = Multimodal.buildBmpGray8(4, Array.fill(8)(9))
    val dataOff = 14 + 40 + 256 * 4
    def withStream(bytes: Array[Byte]): Array[Byte] = {
      val b = base.clone(); b(30) = 1
      System.arraycopy(bytes, 0, b, dataOff, bytes.length)
      b
    }
    assert(intercept[IllegalArgumentException](Multimodal.decodeBmp(
      withStream(Array[Byte](5, 7, 0, 1)))).getMessage
        .contains("run past row end"))
    // a run below the raster's last row
    assert(intercept[IllegalArgumentException](Multimodal.decodeBmp(
      withStream(Array[Byte](0, 0, 0, 0, 1, 3, 0, 1)))).getMessage
        .contains("run past raster end"))
    // stream runs off the buffer without end-of-bitmap: the padding
    // zeros parse as end-of-lines until the cursor leaves the buffer
    assert(intercept[IllegalArgumentException](Multimodal.decodeBmp(
      withStream(Array[Byte](2, 5, 0, 0, 0, 0, 0, 0)))).getMessage
        .contains("truncated stream"))
    // RLE8 + top-down (negative height) is a spec contradiction
    val td = base.clone(); td(30) = 1
    val hNeg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(hNeg, 0, td, 22, 4)
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeBmp(td)).getMessage.contains("bottom-up"))
  }

  test("decodeAvi: real RIFF/AVI walker round-trips frames exactly " +
    "through the hdrl header, an odd-size JUNK chunk and the " +
    "bottom-up stride-padded 00db rasters") {
    // width 6 -> stride 8 (2 pad bytes per row, load-bearing)
    val f0 = Array.tabulate(24)(i => (i * 11) % 256)
    val f1 = Array.tabulate(24)(i => (i * 7 + 3) % 256)
    val avi = Multimodal.buildAviGray8(6, 4, Seq(f0, f1),
      junkChunk = true)
    val clip = Multimodal.decodeAvi(avi)
    assert(clip.width == 6 && clip.height == 4)
    assert(clip.frames.length == 2)
    assert(clip.frames(0).toSeq == f0.toSeq)
    assert(clip.frames(1).toSeq == f1.toSeq)
  }

  test("decodeAvi: rejects non-AVI payloads and frame-count " +
    "mismatches with named errors") {
    val notAvi = intercept[IllegalArgumentException](
      Multimodal.decodeAvi(Multimodal.buildWavPcm8(8000, 1,
        Array.fill(16)(0))))
    assert(notAvi.getMessage.contains("AVI"))
    // corrupt dwTotalFrames (avih body +16; avih body starts at
    // 12 + 8('LIST'+sz) + 4('hdrl') + 8('avih'+sz) = 32)
    val avi = Multimodal.buildAviGray8(4, 2,
      Seq(Array.fill(8)(5), Array.fill(8)(9)))
    val bad = avi.clone(); bad(32 + 16) = 9
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeAvi(bad)).getMessage.contains("frames"))
  }

  test("hostile payloads get named errors, never hangs or raw " +
    "index crashes: negative chunk sizes, truncated rasters, " +
    "oversized declared dims") {
    // negative RIFF chunk size used to stall the walk forever
    val avi = Multimodal.buildAviGray8(4, 2, Seq(Array.fill(8)(1)))
    val negSz = avi.clone()
    negSz(12 + 4) = 0xf8.toByte; negSz(12 + 5) = 0xff.toByte
    negSz(12 + 6) = 0xff.toByte; negSz(12 + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeAvi(negSz)).getMessage.contains("negative"))
    val wav = Multimodal.buildWavPcm8(8000, 1, Array.fill(8)(0))
    val negWav = wav.clone()
    negWav(12 + 4) = 0xf8.toByte; negWav(12 + 5) = 0xff.toByte
    negWav(12 + 6) = 0xff.toByte; negWav(12 + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeWav(negWav)).getMessage.contains("negative"))
    // a BMP header declaring dims far past the real buffer
    val bmp = Multimodal.buildBmpGray8(4, Array.fill(8)(1))
    val bigDims = bmp.clone()
    bigDims(18) = 0xe8.toByte; bigDims(19) = 0x03.toByte // width 1000
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeBmp(bigDims)).getMessage.contains("truncated"))
    // Int.MinValue height survives math.abs negative — named reject
    val minH = bmp.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeBmp(minH)).getMessage.contains("height"))
    // an AVI frame whose declared size lies about truncated bytes —
    // the container walk now rejects the lying chunk size itself
    // (before the raster read gets a chance to), with the chunk named
    val trunc = avi.take(avi.length - 4)
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeAvi(trunc)).getMessage
        .contains("runs past the buffer"))
  }

  test("videoFrameFeatsAvi: q382 contract — position-weighted frame " +
    "checksums over REAL decoded frames match the direct recompute") {
    val text = ("synthetic video payload from document text, at " +
      "least three frames of twenty-four codepoints!").padTo(72, 'v')
    val fpx = 24
    val nf = text.length / fpx
    val frames = (0 until nf).map(f =>
      text.slice(f * fpx, (f + 1) * fpx).map(_.toInt).toArray)
    val ds = Seq(MediaRecord(5L, "video", "avi",
      Multimodal.buildAviGray8(6, 4, frames, junkChunk = true))).toDS()
    val got = Multimodal.videoFrameFeatsAvi(ds).collect()
      .sortBy(_.frame_no)
    got.zip(frames).zipWithIndex.foreach { case ((g, f), i) =>
      val wsum = f.zipWithIndex.map { case (p, j) =>
        (j + 1L) * p }.sum
      assert(g.frame_no == i && g.wsum == wsum && g.n_px == 24L &&
        g.width == 6 && g.height == 4)
    }
    assert(got.length == nf)
  }

  test("imageBlocksBmp: q381 contract — 10x10 block sums over the " +
    "REAL decoded raster match the direct recompute") {
    val text = ("a tiny synthetic raster payload built from document " +
      "text codepoints exactly like the query does it ").padTo(95, 'x')
    val W = 30
    val h = text.length / W
    val px = text.take(h * W).map(_.toInt).toArray
    val ds = Seq(MediaRecord(3L, "image", "bmp",
      Multimodal.buildBmpGray8(W, px))).toDS()
    val got = Multimodal.imageBlocksBmp(ds, 10).collect()
      .map(b => (b.block_row, b.block_col) ->
        (b.sum_px, b.n_px, b.width, b.height)).toMap
    val want = px.zipWithIndex
      .groupBy { case (_, i) => (i / W / 10, i % W / 10) }
      .map { case (k, xs) =>
        k -> (xs.map(_._1.toLong).sum, xs.length.toLong, W, h) }
    assert(got == want)
  }
}
