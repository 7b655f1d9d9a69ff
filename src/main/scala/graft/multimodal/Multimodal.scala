package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media content is an opaque `binary` column plus typed metadata —
  * the lakehouse-native layout (`spark.read.format("binaryFile")` or a
  * parquet/Delta table with a BLOB column). Decode / feature-extract /
  * resize / frame-sample run as **partition-batched typed pipelines**
  * (`Dataset.mapPartitions`): one iterator pass per partition, the
  * Scala analog of `mapInPandas` — constant memory, no driver
  * round-trip, schema known to Catalyst via Encoders.
  *
  * The codec itself is a STUB (this container ships no image/audio
  * libraries): `decodePixels`/`decodeSamples` deterministically
  * reinterpret the raw bytes as pixels/samples. Every surrounding
  * piece — schema, partitioning, batch shape, feature math — is real;
  * swapping in libjpeg/ffmpeg changes only those two functions.
  *
  * Scale: decode is embarrassingly parallel (no shuffle); feature rows
  * are tiny compared to content, so downstream aggregation shuffles
  * only features. At 100 TB, partition the media table by kind/date
  * and size `spark.sql.files.maxPartitionBytes` so one task holds a
  * bounded number of blobs in flight.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, fmt: String,
                         content: Array[Byte])
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           n_pixels: Long, sum_pixel: Long,
                           min_pixel: Int, max_pixel: Int)
  case class Frame(media_id: Long, frame_no: Int, frame_hash: Long,
                   n_bytes: Int)
  case class AudioWindow(media_id: Long, window_no: Int, energy: Long,
                         n_samples: Int)
  case class FrameFeat(media_id: Long, frame_no: Int, fsum: Long,
                       fmin: Int, fmax: Int, fhash: Long)

  /** Deterministic media table derived from the documents corpus:
    * content = UTF-8 bytes of the text (an opaque payload as far as
    * the pipeline is concerned), kind round-robined by id. */
  /** Modality of a synthetic media id (doc_id mod 3). */
  private def kindOf(id: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))

  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"),
      col("text").cast("binary").as("content"))

  /** Media↔caption training-pair batches: join each media item back to
    * its caption text, then assign pairs to fixed-size batches PER
    * MODALITY (row_number over media id within kind — deterministic,
    * no global sort) — the batch-shape step of multimodal training
    * prep. Output: one row per (kind, batch) with its pair count,
    * caption-token sum, and id span. */
  def captionPairBatches(docs: DataFrame, batchSize: Int): DataFrame = {
    // kind and caption tokens are both per-row functions of the doc —
    // one scan, no join back against the media frame
    val pairs = docs.select(col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      graft.operators.TextAnalysis.wsTokens(col("text")).as("cap_toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("media_id"))
    pairs
      .withColumn("batch", graft.functions.NowFunctions.intDiv(
        row_number().over(w).cast("long") - 1, lit(batchSize.toLong)))
      .groupBy(col("kind"), col("batch"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("cap_toks")).as("cap_tokens"),
        min(col("media_id")).as("first_id"), max(col("media_id")).as("last_id"))
  }

  // ───────────────────────── STUBBED CODECS ─────────────────────────
  /** STUB image decode: bytes are the pixel array (grayscale u8).
    * Production: JNI/javacpp libjpeg decode to the same Array[Int]. */
  private def decodePixels(content: Array[Byte]): Array[Int] =
    content.map(b => b & 0xff)

  /** STUB audio decode for the legacy raw-i8 queries: bytes are
    * centered i8 PCM samples. The REAL audio path is decodeWav below
    * (r12) — this reinterpretation stub remains only for the q61/q151/
    * q256 contracts whose payloads are raw text bytes, not WAV. */
  private def decodeSamples(content: Array[Byte]): Array[Int] =
    content.map(b => (b & 0xff) - 128)
  // ───────────────────────────────────────────────────────────────────

  // ─────────────────────── REAL AUDIO CODEC (r12) ───────────────────
  case class WavClip(sample_rate: Int, channels: Int,
                     bits_per_sample: Int, samples: Array[Int],
                     format_tag: Int = 1)

  // ── G.711 companding (r14 verdict task 4) ──────────────────────────
  // ITU-T G.711 µ-law/A-law — the compressed formats real scraped
  // telephony/VoIP audio arrives in (WAV format tags 7 and 6). The
  // expansion is the public-domain CCITT reference algorithm
  // (Sun/g711.c lineage): 8-bit codeword → 16-bit linear PCM.
  /** µ-law codeword (0..255) → linear sample (±32124). */
  def ulawExpand(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }
  /** A-law codeword (0..255) → linear sample (±32256). */
  def alawExpand(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case s => t += 0x108; t <<= s - 1
    }
    if ((a & 0x80) != 0) t else -t
  }
  private val ulawTable: Array[Int] = Array.tabulate(256)(ulawExpand)
  private val alawTable: Array[Int] = Array.tabulate(256)(alawExpand)

  /** Linear PCM (16-bit) → µ-law codeword — the reference encoder
    * works on the 14-bit magnitude (pcm >> 2), biases by 33, finds
    * the exponent segment, keeps 4 mantissa bits, and complements.
    * Satisfies ulawCompress(ulawExpand(c)) == c for all 256 codes
    * (fuzz-asserted in CodecPropertySpec). */
  def ulawCompress(pcm0: Int): Int = {
    var pcm = pcm0 >> 2 // 14-bit domain
    val mask = if (pcm < 0) { pcm = -pcm; 0x7f } else 0xff
    if (pcm > 8159) pcm = 8159 // CLIP
    pcm += 33 // BIAS >> 2
    val segEnd = Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff,
      0xfff, 0x1fff)
    val seg = segEnd.indexWhere(pcm <= _)
    if (seg < 0) 0x7f ^ mask
    else (((seg << 4) | ((pcm >> (seg + 1)) & 0x0f)) ^ mask) & 0xff
  }
  /** Linear PCM (16-bit) → A-law codeword — reference encoder on the
    * 13-bit domain (pcm >> 3), XOR 0x55 transmission inversion. */
  def alawCompress(pcm0: Int): Int = {
    var pcm = pcm0 >> 3 // 13-bit domain
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    val segEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff,
      0x7ff, 0xfff)
    val seg = segEnd.indexWhere(pcm <= _)
    if (seg < 0) (0x7f ^ mask) & 0xff
    else {
      val mant = if (seg < 2) (pcm >> 1) & 0x0f else (pcm >> seg) & 0x0f
      (((seg << 4) | mant) ^ mask) & 0xff
    }
  }

  // ── IMA ADPCM (r15 verdict task 5) ─────────────────────────────────
  // IMA/DVI ADPCM, WAV format tag 0x11 — the codec family's next
  // public compressed format after G.711: 4-bit differential coding
  // over a public 89-entry step-size table, block-aligned with a
  // per-block (predictor, step-index) header. Real scraped
  // telephony/game audio. Tables and update rules are the public IMA
  // specification (also in RFC 3551 §4.5.1 lineage).
  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)
  private val imaIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8) // by nibble magnitude (n & 7)

  /** One IMA ADPCM state step: decode nibble `n` against
    * (predictor, stepIndex), returning the new state — the new
    * predictor IS the decoded sample. */
  def imaStep(pred: Int, sidx: Int, n: Int): (Int, Int) = {
    val step = imaStepTable(sidx)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p0 = if ((n & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, sidx + imaIndexAdj(n & 7)))
    (p, i)
  }

  /** IMA ADPCM encoder: 16-bit samples → 4-bit nibbles, starting
    * from (predictor=0, stepIndex=initIndex). The standard greedy
    * quantizer (sign + three threshold bits), with the state advanced
    * by the DECODER's update rule so encoder and decoder track the
    * same predictor — the property the CodecPropertySpec round-trip
    * fuzz asserts (lossy codec: decode∘encode matches the reference
    * decoder's reconstruction, not the input). */
  def adpcmEncode(samples: Array[Int], initIndex: Int): Array[Int] = {
    var pred = 0
    var sidx = math.max(0, math.min(88, initIndex))
    samples.map { s =>
      val step = imaStepTable(sidx)
      var delta = s - pred
      var code = 0
      if (delta < 0) { code = 8; delta = -delta }
      if (delta >= step) { code |= 4; delta -= step }
      if (delta >= (step >> 1)) { code |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) code |= 1
      val (p, i) = imaStep(pred, sidx, code)
      pred = p; sidx = i
      code
    }
  }

  /** Serialize an IMA ADPCM nibble stream to a spec-exact RIFF/WAVE
    * payload (format tag 0x11, mono): fmt chunk with the tag-17
    * extension (cbSize=2, wSamplesPerBlock), data as blocks of
    * `blockAlign` bytes — 4-byte header (int16 predictor, uint8 step
    * index, reserved 0) + packed nibbles low-first. The builder runs
    * the decoder's state machine while laying blocks out, so each
    * block header carries the true running (predictor, index) exactly
    * as a real streaming encoder writes it. `nibbles.length` must be
    * a multiple of the block's nibble capacity — a partial final
    * block is a named error, not silent zero-padding (zero nibbles
    * are NOT silence in a differential codec). */
  def buildWavAdpcm(sampleRate: Int, nibbles: Array[Int],
                    blockAlign: Int, initIndex: Int): Array[Byte] = {
    require(blockAlign >= 5, s"ADPCM block align $blockAlign too " +
      "small (needs 4 header bytes + data)")
    val perBlock = (blockAlign - 4) * 2
    require(nibbles.length % perBlock == 0,
      s"ADPCM nibble count ${nibbles.length} is not a multiple of " +
        s"the block capacity $perBlock")
    val nBlocks = nibbles.length / perBlock
    val spb = perBlock + 1 // header predictor counts as a sample
    val dataSz = nBlocks * blockAlign
    val riffSz = 4 + (8 + 20) + (8 + dataSz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSz)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(20)
    buf.putShort(0x11); buf.putShort(1)
    buf.putInt(sampleRate)
    // byte rate for ADPCM: blocks per second × block size
    buf.putInt((sampleRate.toLong * blockAlign / spb).toInt)
    buf.putShort(blockAlign.toShort); buf.putShort(4)
    buf.putShort(2); buf.putShort(spb.toShort) // cbSize, samples/block
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSz)
    var pred = 0
    var sidx = math.max(0, math.min(88, initIndex))
    var k = 0
    while (k < nBlocks) {
      buf.putShort(pred.toShort); buf.put(sidx.toByte); buf.put(0.toByte)
      var j = 0
      while (j < perBlock) {
        val lo = nibbles(k * perBlock + j) & 0x0f
        val hi = nibbles(k * perBlock + j + 1) & 0x0f
        buf.put((lo | (hi << 4)).toByte)
        val (p1, i1) = imaStep(pred, sidx, lo)
        val (p2, i2) = imaStep(p1, i1, hi)
        pred = p2; sidx = i2
        j += 2
      }
      k += 1
    }
    buf.array()
  }

  /** Real RIFF/WAVE parser (public container spec: `RIFF <size> WAVE`
    * then even-aligned `<id> <size> <body>` chunks): walks every
    * chunk honoring the RIFF odd-size pad byte, reads integer-PCM
    * `fmt ` (format tag 1) and `data`, and decodes 8-bit unsigned or
    * 16-bit signed little-endian samples (interleaved when
    * multi-channel). Unknown chunks (JUNK/LIST/fact/…) are skipped.
    * This replaces the audio decode stub: the bytes in, samples out
    * contract is the real one; only the compressed codecs (mp3 etc.)
    * would still need an external library. */
  def decodeWav(content: Array[Byte]): WavClip = {
    def u8(i: Int): Int = content(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def s16(i: Int): Int = le16(i).toShort.toInt
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(content, i, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    require(content.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    // (tag, ch, rate, bits, blockAlign, samplesPerBlock) — the last
    // two only meaningful for the block-aligned ADPCM format
    var fmt = Option.empty[(Int, Int, Int, Int, Int, Int)]
    var data = Option.empty[(Int, Int)]     // (body offset, size)
    while (off + 8 <= content.length) {
      val id = tag(off)
      val sz = le32(off + 4).toInt
      // a hostile size field (negative when read signed) would stall
      // or reverse the walk — named error beats an infinite loop
      require(sz >= 0, s"WAV: negative chunk size for '$id'")
      val body = off + 8
      id match {
        case "fmt " =>
          require(sz >= 16, "fmt chunk too short")
          val formatTag = le16(body)
          require(formatTag == 1 || formatTag == 6 || formatTag == 7 ||
              formatTag == 0x11,
            s"unsupported WAV format tag $formatTag " +
              "(1=PCM, 6=A-law, 7=µ-law, 17=IMA ADPCM supported)")
          // tag 17 carries the wSamplesPerBlock extension (cbSize=2)
          val spb =
            if (formatTag == 0x11) {
              require(sz >= 20,
                "ADPCM fmt chunk too short for wSamplesPerBlock")
              le16(body + 18)
            } else 0
          fmt = Some((formatTag, le16(body + 2), le32(body + 4).toInt,
            le16(body + 14), le16(body + 12), spb))
        case "data" => data = Some((body, sz))
        case _ => () // JUNK/LIST/fact/…: walked over
      }
      off = body + sz + (sz & 1) // RIFF pads odd-size chunks to even
    }
    val (tagFmt, ch, rate, bits, blockAlign, spb) = fmt.getOrElse(
      throw new IllegalArgumentException("WAV: missing fmt chunk"))
    val (doff, dsz) = data.getOrElse(
      throw new IllegalArgumentException("WAV: missing data chunk"))
    val end = math.min(doff + dsz, content.length)
    val samples = (tagFmt, bits) match {
      case (1, 8) => Array.tabulate(end - doff)(i => u8(doff + i) - 128)
      case (1, 16) =>
        Array.tabulate((end - doff) / 2)(i => s16(doff + 2 * i))
      // G.711 (r14): one codeword byte per sample, table expansion
      // to 16-bit linear — a non-8-bit width in the header is a
      // hostile/corrupt stream, rejected by name
      case (6, 8) => Array.tabulate(end - doff)(i => alawTable(u8(doff + i)))
      case (7, 8) => Array.tabulate(end - doff)(i => ulawTable(u8(doff + i)))
      case (6 | 7, b) => throw new IllegalArgumentException(
        s"G.711 WAV requires 8-bit codewords, header says $b")
      // IMA ADPCM (r15): block-aligned 4-bit differential decode.
      // Each block: 4-byte header (int16 predictor — emitted as the
      // block's first sample — uint8 step index, reserved), then
      // packed nibbles low-first, each advancing the (predictor,
      // index) state machine. Hostile streams fail by name: a bad
      // block align, a truncated final block, or an out-of-range
      // step index would otherwise index out of the step table or
      // mis-frame every later block.
      case (0x11, 4) =>
        require(ch == 1,
          s"IMA ADPCM: only mono supported (header says $ch channels)")
        require(blockAlign >= 5,
          s"IMA ADPCM: block align $blockAlign too small " +
            "(4-byte header + data)")
        val dsz = end - doff
        require(dsz % blockAlign == 0,
          s"IMA ADPCM: truncated block — data size $dsz is not a " +
            s"multiple of block align $blockAlign")
        val perBlock = (blockAlign - 4) * 2
        require(spb == perBlock + 1,
          s"IMA ADPCM: header says $spb samples per block, block " +
            s"align $blockAlign implies ${perBlock + 1}")
        val nBlocks = dsz / blockAlign
        val out = new Array[Int](nBlocks * (perBlock + 1))
        var k = 0
        var w = 0
        while (k < nBlocks) {
          val boff = doff + k * blockAlign
          var pred = s16(boff)
          var sidx = u8(boff + 2)
          require(sidx <= 88,
            s"IMA ADPCM: step index $sidx out of range (0..88)")
          out(w) = pred; w += 1
          var j = 0
          while (j < blockAlign - 4) {
            val byte = u8(boff + 4 + j)
            val (p1, i1) = imaStep(pred, sidx, byte & 0x0f)
            out(w) = p1; w += 1
            val (p2, i2) = imaStep(p1, i1, (byte >> 4) & 0x0f)
            out(w) = p2; w += 1
            pred = p2; sidx = i2
            j += 1
          }
          k += 1
        }
        out
      case (0x11, b) => throw new IllegalArgumentException(
        s"IMA ADPCM requires 4-bit samples, header says $b")
      case (_, b) => throw new IllegalArgumentException(
        s"unsupported PCM width $b (8/16 supported)")
    }
    WavClip(rate, ch, bits, samples, tagFmt)
  }

  /** Serialize G.711 codewords (0..255, one byte per sample) to a
    * spec-exact RIFF/WAVE payload with format tag 7 (µ-law) or 6
    * (A-law) — the inverse container of the decodeWav G.711 path. */
  def buildWavG711(sampleRate: Int, channels: Int,
                   codewords: Array[Int], mulaw: Boolean): Array[Byte] = {
    val dataSz = codewords.length
    val riffSz = 4 + (8 + 16) + (8 + dataSz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSz)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(if (mulaw) 7 else 6); buf.putShort(channels.toShort)
    buf.putInt(sampleRate); buf.putInt(sampleRate * channels)
    buf.putShort(channels.toShort); buf.putShort(8)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSz)
    codewords.foreach(c => buf.put((c & 0xff).toByte))
    buf.array()
  }

  /** Serialize 16-bit PCM to a spec-exact RIFF/WAVE payload (the
    * inverse of decodeWav, used for the deterministic synthetic test
    * corpus). With `junkChunk` a JUNK chunk with an ODD size is
    * placed ahead of fmt — decode must walk and pad-skip it. */
  def buildWavPcm16(sampleRate: Int, channels: Int, samples: Array[Int],
                    junkChunk: Boolean = false): Array[Byte] = {
    val dataSz = samples.length * 2
    val junkBody = 5 // odd on purpose: exercises the RIFF pad byte
    val junkSz = if (junkChunk) 8 + junkBody + 1 else 0
    val riffSz = 4 + junkSz + (8 + 16) + (8 + dataSz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSz)
    buf.put("WAVE".getBytes("US-ASCII"))
    if (junkChunk) {
      buf.put("JUNK".getBytes("US-ASCII")); buf.putInt(junkBody)
      buf.put(Array.tabulate[Byte](junkBody + 1)(i => (i * 7).toByte))
    }
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(sampleRate); buf.putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSz)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Serialize 8-bit unsigned PCM (sample values −128..127 stored
    * offset-128, the WAV convention). */
  def buildWavPcm8(sampleRate: Int, channels: Int,
                   samples: Array[Int]): Array[Byte] = {
    val dataSz = samples.length
    val riffSz = 4 + (8 + 16) + (8 + dataSz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSz)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(sampleRate); buf.putInt(sampleRate * channels)
    buf.putShort(channels.toShort); buf.putShort(8)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSz)
    samples.foreach(s => buf.put((s + 128).toByte))
    val arr = buf.array()
    // RIFF requires even alignment; 8-bit data may be odd-sized —
    // the builder keeps the declared size exact and appends no pad
    // (data is the last chunk, so no walker ever reads past it)
    arr
  }

  case class AudioWindowSr(media_id: Long, window_no: Int, energy: Long,
                           n_samples: Int, sample_rate: Int)

  /** Windowed energy (Σ sample², exact longs — the q61/q151 integer
    * DSP) over REAL WAV-decoded samples, carrying the decoded header's
    * sample rate so a header mis-parse is value-visible downstream. */
  def audioEnergyWav(media: Dataset[MediaRecord],
                     windowSamples: Int): Dataset[AudioWindowSr] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val clip = decodeWav(m.content)
      clip.samples.grouped(windowSamples).zipWithIndex.map {
        case (w, i) => AudioWindowSr(m.media_id, i,
          w.foldLeft(0L)((a, s) => a + s.toLong * s), w.length,
          clip.sample_rate)
      }
    })
  }
  // ───────────────────────────────────────────────────────────────────

  // ─────────────────────── REAL IMAGE CODEC (r12) ───────────────────
  case class BmpImage(width: Int, height: Int, pixels: Array[Int])

  /** The ONE DIB raster layout both containers share (BMP pixel
    * array, AVI `00db` frame): 4-byte-stride-padded rows. These two
    * helpers are the single read/write implementation — BMP and AVI
    * used to carry four hand-rolled copies of the row-flip +
    * stride-pad loop that had to be kept in lockstep (review
    * finding). Read side bounds-checks against the REAL buffer (a
    * declared size can lie about truncated bytes). */
  private def writeDibRows(buf: java.nio.ByteBuffer, width: Int,
      height: Int, pixels: Array[Int], bottomUp: Boolean): Unit = {
    val stride = ((width + 3) / 4) * 4
    var r0 = 0
    while (r0 < height) {
      val r = if (bottomUp) height - 1 - r0 else r0
      var c = 0
      while (c < width) { buf.put(pixels(r * width + c).toByte); c += 1 }
      var p = width
      while (p < stride) { buf.put(0.toByte); p += 1 }
      r0 += 1
    }
  }

  private def readDibRows(content: Array[Byte], off: Int, width: Int,
      height: Int, bottomUp: Boolean, what: String): Array[Int] = {
    require(width > 0, s"$what: width must be positive")
    require(height >= 0, s"$what: negative height")
    val stride = ((width + 3) / 4) * 4
    require(off >= 0 &&
      off.toLong + stride.toLong * height <= content.length,
      s"$what: truncated pixel data")
    val px = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      val srcRow = if (bottomUp) height - 1 - r else r
      var c = 0
      while (c < width) {
        px(r * width + c) = content(off + srcRow * stride + c) & 0xff
        c += 1
      }
      r += 1
    }
    px
  }

  /** Real Windows BMP parser (public DIB spec): BITMAPFILEHEADER
    * (`BM`, file size, pixel-data offset) + BITMAPINFOHEADER (width;
    * POSITIVE height = bottom-up row order, negative = top-down;
    * planes=1; bpp; BI_RGB only) + the palette for 8-bit rasters;
    * pixel rows are stride-padded to 4-byte boundaries. Decodes 8-bit
    * palette-indexed rasters to a row-major TOP-DOWN gray array via
    * palette lookup (red channel of the BGRA entry). Replaces the
    * image decode stub on the q381 path: bytes in, raster out is the
    * real contract; compressed formats (JPEG/PNG) would still need an
    * external library. */
  def decodeBmp(content: Array[Byte]): BmpImage = {
    def u8(i: Int): Int = content(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) |
      (u8(i + 2) << 16) | (u8(i + 3) << 24)
    require(content.length >= 54 && u8(0) == 'B'.toInt &&
      u8(1) == 'M'.toInt, "not a BMP payload")
    val dataOff = le32(10)
    val hdrSz = le32(14)
    require(hdrSz >= 40, s"unsupported DIB header size $hdrSz")
    val width = le32(18)
    val heightRaw = le32(22)
    // Int.MinValue survives math.abs negative — reject it by name
    // before it reaches the array sizing (review finding)
    require(heightRaw != Int.MinValue, "BMP: height out of range")
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    require(le16(26) == 1, "BMP: planes must be 1")
    val bpp = le16(28)
    require(bpp == 8, s"unsupported bpp $bpp (8-bit palette only)")
    val compression = le32(30)
    require(compression == 0 || compression == 1,
      s"BMP: unsupported compression $compression " +
        "(BI_RGB or BI_RLE8 only)")
    // the spec defines RLE8 only for bottom-up rasters
    require(compression == 0 || bottomUp,
      "BMP: BI_RLE8 requires a bottom-up raster")
    val palOff = 14 + hdrSz
    val palEntries = { val c = le32(46); if (c == 0) 256 else c }
    require(palEntries > 0 &&
      palOff.toLong + palEntries.toLong * 4 <= content.length,
      "BMP: truncated palette")
    def gray(idx: Int): Int = {
      require(idx < palEntries, s"palette index $idx out of range")
      u8(palOff + idx * 4 + 2) // BGRA entry: red channel
    }
    val idx =
      if (compression == 1) decodeRle8(content, dataOff, width, height)
      else readDibRows(content, dataOff, width, height, bottomUp, "BMP")
    BmpImage(width, height, idx.map(gray))
  }

  /** BI_RLE8 decompression (public BMP spec; r12 verdict task 4 —
    * the first compressed format behind the codec trio). Stream of
    * 2-byte tokens: (n>0, v) = encoded run of n copies of v;
    * (0, 0) = end of line; (0, 1) = end of bitmap; (0, 2) + (dx, dy)
    * = delta skip (skipped pixels read 0, per spec); (0, n≥3) + n
    * literal bytes WORD-padded = absolute run. Output is the same
    * top-down raster readDibRows yields (RLE8 is bottom-up by spec).
    * Hostile inputs — runs past the row or raster end, a truncated
    * stream, a delta past the raster — get named errors, mirroring
    * the uncompressed path's real-buffer guards. Output is bounded
    * by width×height regardless of declared sizes. */
  private def decodeRle8(content: Array[Byte], off: Int, width: Int,
      height: Int): Array[Int] = {
    require(off >= 0 && off <= content.length,
      "BMP RLE8: pixel-data offset out of range")
    val px = new Array[Int](width * height) // skipped pixels read 0
    var i = off
    var x = 0
    var yUp = 0 // bottom-up row cursor
    var done = false
    def put(v: Int): Unit = {
      require(x < width, "BMP RLE8: run past row end")
      require(yUp < height, "BMP RLE8: run past raster end")
      px((height - 1 - yUp) * width + x) = v
      x += 1
    }
    while (!done) {
      require(i + 2 <= content.length, "BMP RLE8: truncated stream")
      val b0 = content(i) & 0xff
      val b1 = content(i + 1) & 0xff
      i += 2
      if (b0 > 0) {
        var k = 0
        while (k < b0) { put(b1); k += 1 }
      } else b1 match {
        case 0 => x = 0; yUp += 1
        case 1 => done = true
        case 2 =>
          require(i + 2 <= content.length, "BMP RLE8: truncated delta")
          val dx = content(i) & 0xff
          val dy = content(i + 1) & 0xff
          i += 2
          require(x + dx <= width && yUp + dy <= height,
            "BMP RLE8: delta past raster end")
          x += dx; yUp += dy
        case n =>
          require(i + n <= content.length,
            "BMP RLE8: truncated absolute run")
          var k = 0
          while (k < n) { put(content(i + k) & 0xff); k += 1 }
          i += n + (n & 1) // absolute runs are WORD-aligned
      }
    }
    px
  }

  /** Serialize an 8-bit grayscale raster (row-major top-down) to a
    * spec-exact BMP: identity 256-entry gray palette, BOTTOM-UP row
    * order, 4-byte row stride — the inverse of decodeBmp, for the
    * deterministic synthetic corpus. A non-multiple-of-4 width makes
    * the stride padding load-bearing. */
  def buildBmpGray8(width: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && pixels.length % width == 0,
      "pixels must be whole rows")
    // .toByte would silently truncate an out-of-range value (e.g. a
    // non-Latin-1 codepoint fed as a pixel) — fail loudly instead
    require(pixels.forall(p => p >= 0 && p <= 255),
      "BMP build: pixel values must be 0..255")
    val height = pixels.length / width
    val stride = ((width + 3) / 4) * 4
    val dataSz = stride * height
    val buf = bmpGray8Header(width, height, dataSz, compression = 0)
    writeDibRows(buf, width, height, pixels, bottomUp = true)
    buf.array()
  }

  /** Shared 8-bit-gray BMP container: BITMAPFILEHEADER +
    * BITMAPINFOHEADER + identity 256-entry gray palette (B,G,R,0
    * entries), buffer left positioned at the pixel data. One writer
    * for the BI_RGB and BI_RLE8 builders so the two containers can't
    * drift. */
  private def bmpGray8Header(width: Int, height: Int, dataSz: Int,
      compression: Int): java.nio.ByteBuffer = {
    val dataOff = 14 + 40 + 256 * 4
    val buf = java.nio.ByteBuffer.allocate(dataOff + dataSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(dataOff + dataSz)
    buf.putShort(0); buf.putShort(0)
    buf.putInt(dataOff)
    buf.putInt(40); buf.putInt(width); buf.putInt(height)
    buf.putShort(1); buf.putShort(8)
    buf.putInt(compression) // 0 = BI_RGB, 1 = BI_RLE8
    buf.putInt(dataSz)
    buf.putInt(2835); buf.putInt(2835) // 72 DPI both axes
    buf.putInt(256); buf.putInt(0)
    var i = 0
    while (i < 256) { // palette entries are B,G,R,reserved
      buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }
    buf
  }

  /** Serialize an 8-bit grayscale raster (row-major top-down) to a
    * spec-exact BI_RLE8-compressed BMP — the inverse of decodeBmp's
    * RLE8 arm. Rows emit bottom-up as maximal encoded runs (≤255),
    * except literal stretches of ≥3 DISTINCT consecutive values,
    * which emit as absolute runs (WORD-padded) so both decode arms
    * are load-bearing; every row ends with end-of-line, the stream
    * with end-of-bitmap. */
  def buildBmpRle8(width: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && pixels.length % width == 0,
      "pixels must be whole rows")
    require(pixels.forall(p => p >= 0 && p <= 255),
      "BMP RLE8 build: pixel values must be 0..255")
    val height = pixels.length / width
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var r0 = 0
    while (r0 < height) {
      val r = height - 1 - r0 // bottom-up, per spec
      var c = 0
      while (c < width) {
        def v(k: Int): Int = pixels(r * width + k)
        var run = 1
        while (c + run < width && v(c + run) == v(c) && run < 255)
          run += 1
        if (run >= 2) {
          out += run.toByte; out += v(c).toByte
          c += run
        } else {
          // literal stretch: values where the NEXT value differs
          var lit = 1
          while (c + lit < width && lit < 255 &&
              (c + lit + 1 >= width || v(c + lit + 1) != v(c + lit)))
            lit += 1
          if (lit >= 3) {
            out += 0.toByte; out += lit.toByte
            var k = 0
            while (k < lit) { out += v(c + k).toByte; k += 1 }
            if ((lit & 1) == 1) out += 0.toByte // WORD pad
            c += lit
          } else {
            out += 1.toByte; out += v(c).toByte
            c += 1
          }
        }
      }
      out += 0.toByte; out += 0.toByte // end of line
      r0 += 1
    }
    out += 0.toByte; out += 1.toByte // end of bitmap
    val buf = bmpGray8Header(width, height, out.length,
      compression = 1)
    buf.put(out.toArray)
    buf.array()
  }

  // ─────────────────────── REAL VIDEO CODEC (r12) ───────────────────
  case class AviClip(width: Int, height: Int,
                     frames: Array[Array[Int]])

  /** Real AVI container parser (public RIFF form `AVI `): walks the
    * outer RIFF chunks honoring the odd-size pad byte, reads the
    * `LIST hdrl` → `avih` main header (frame width/height/count) and
    * the `LIST movi` stream, collecting uncompressed `00db` video
    * frames — each a raw bottom-up, 4-byte-stride-padded 8-bit DIB
    * raster (the BMP pixel-array layout) — into TOP-DOWN row-major
    * gray arrays. Non-frame chunks anywhere (JUNK, idx1, `00wb`
    * audio) are walked over. Completes the codec trio with decodeWav
    * and decodeBmp; compressed streams (MJPEG/H.264) would still need
    * an external library. */
  def decodeAvi(content: Array[Byte]): AviClip = {
    def u8(i: Int): Int = content(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) |
      (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int): String = new String(content, i, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    require(content.length >= 12 && tag(0) == "RIFF" &&
      tag(8) == "AVI ", "not a RIFF/AVI payload")
    var dims = Option.empty[(Int, Int, Int)] // (width, height, frames)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = tag(off)
        val sz = le32(off + 4)
        // a hostile size field (negative when read signed) would
        // stall or reverse the walk — named error beats a hang
        require(sz >= 0, s"AVI: negative chunk size for '$id'")
        val body = off + 8
        // a lying size field walking past the REAL buffer must fail
        // with the named error, not an index exception downstream —
        // and body + sz in Int could overflow and silently END the
        // walk instead of rejecting the header (r12 advisory)
        require(body.toLong + sz <= to,
          s"AVI: chunk '$id' size $sz runs past the buffer")
        id match {
          case "LIST" =>
            require(body + 4 <= to, "AVI: truncated LIST header")
            val listType = tag(body)
            if (listType == "hdrl" || listType == "movi")
              walk(body + 4, math.min(body + sz, to))
          case "avih" =>
            require(sz >= 40, "avih header too short")
            require(body + 40 <= content.length,
              "AVI: avih header runs past the buffer")
            // dwWidth @ +32, dwHeight @ +36, dwTotalFrames @ +16
            dims = Some((le32(body + 32), le32(body + 36),
              le32(body + 16)))
          case "00db" =>
            val (w, h, _) = dims.getOrElse(throw
              new IllegalArgumentException("AVI: 00db before avih"))
            require(h > 0, "AVI: nonpositive frame height")
            val stride = ((w + 3) / 4) * 4
            require(sz >= stride * h, "AVI: truncated frame")
            frames += readDibRows(content, body, w, h,
              bottomUp = true, "AVI") // checks the REAL buffer too
          case _ => () // JUNK/idx1/00wb/strl leaves…: walked over
        }
        off = body + sz + (sz & 1) // RIFF odd-size pad
      }
    }
    walk(12, content.length)
    val (w, h, n) = dims.getOrElse(
      throw new IllegalArgumentException("AVI: missing avih header"))
    require(frames.length == n,
      s"AVI: header declares $n frames, stream carries ${frames.length}")
    AviClip(w, h, frames.toArray)
  }

  /** Serialize 8-bit grayscale frames (row-major top-down) to a
    * spec-exact AVI: LIST hdrl with a 56-byte avih, LIST movi of
    * `00db` bottom-up stride-padded DIB frames — the inverse of
    * decodeAvi, for the deterministic synthetic corpus. With
    * `junkChunk` an odd-size JUNK chunk lands between hdrl and movi,
    * so decode must walk and pad-skip it. */
  def buildAviGray8(width: Int, height: Int,
                    frames: Seq[Array[Int]],
                    junkChunk: Boolean = false): Array[Byte] = {
    require(frames.forall(_.length == width * height),
      "every frame must be width*height pixels")
    require(frames.forall(_.forall(p => p >= 0 && p <= 255)),
      "AVI build: pixel values must be 0..255")
    val stride = ((width + 3) / 4) * 4
    val frameSz = stride * height
    val hdrlSz = 4 + 8 + 56                 // 'hdrl' + avih chunk
    val junkBody = 7                        // odd: exercises the pad
    val junkSz = if (junkChunk) 8 + junkBody + 1 else 0
    val moviSz = 4 + frames.length * (8 + frameSz)
    val riffSz = 4 + (8 + hdrlSz) + junkSz + (8 + moviSz)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSz)
    buf.put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")); buf.putInt(hdrlSz)
    buf.put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")); buf.putInt(56)
    buf.putInt(40000)                       // dwMicroSecPerFrame
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(frames.length)               // dwTotalFrames @ +16
    buf.putInt(0); buf.putInt(1)            // streams
    buf.putInt(frameSz)
    buf.putInt(width); buf.putInt(height)   // @ +32, +36
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    if (junkChunk) {
      buf.put("JUNK".getBytes("US-ASCII")); buf.putInt(junkBody)
      buf.put(Array.tabulate[Byte](junkBody + 1)(i => (i * 3).toByte))
    }
    buf.put("LIST".getBytes("US-ASCII")); buf.putInt(moviSz)
    buf.put("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      buf.put("00db".getBytes("US-ASCII")); buf.putInt(frameSz)
      writeDibRows(buf, width, height, f, bottomUp = true)
    }
    buf.array()
  }

  case class VideoFrameFeat(media_id: Long, frame_no: Int, wsum: Long,
                            n_px: Long, width: Int, height: Int)

  /** Position-weighted frame checksums (Σ (i+1)·pixel over the
    * TOP-DOWN row-major raster — ORDER-SENSITIVE on purpose: a
    * row-order or stride slip in the container round-trip moves the
    * value, where a plain sum would not) over REAL AVI-decoded
    * frames, carrying the decoded header's dimensions. Row-local:
    * one mapPartitions pass. */
  def videoFrameFeatsAvi(media: Dataset[MediaRecord])
      : Dataset[VideoFrameFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val clip = decodeAvi(m.content)
      clip.frames.iterator.zipWithIndex.map { case (f, i) =>
        var w = 0L
        var j = 0
        while (j < f.length) { w += (j + 1L) * f(j); j += 1 }
        VideoFrameFeat(m.media_id, i, w, f.length.toLong,
          clip.width, clip.height)
      }
    })
  }

  case class ImageBlock(media_id: Long, block_row: Int, block_col: Int,
                        sum_px: Long, n_px: Long, width: Int,
                        height: Int)

  /** Block-sum raster pooling (the downsample step of a pHash or
    * thumbnail pipeline) over REAL BMP-decoded rasters, carrying the
    * decoded header's dimensions so a stride/row-order mis-parse is
    * value-visible downstream. Row-local: one mapPartitions pass. */
  def imageBlocksBmp(media: Dataset[MediaRecord],
                     block: Int): Dataset[ImageBlock] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val img = decodeBmp(m.content)
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), (Long, Long)]
      var i = 0
      while (i < img.pixels.length) {
        val k = (i / img.width / block, i % img.width / block)
        val (s0, n0) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (s0 + img.pixels(i), n0 + 1L)
        i += 1
      }
      acc.iterator.map { case ((br, bc), (sm, n)) =>
        ImageBlock(m.media_id, br, bc, sm, n, img.width, img.height)
      }
    })
  }
  // ───────────────────────────────────────────────────────────────────

  /** Fixed fake raster width for the stub decoder. */
  val StubWidth = 32

  private def features(id: Long, px: Array[Int]): ImageFeatures = {
    var sum = 0L; var mn = 255; var mx = 0
    px.foreach { p => sum += p; if (p < mn) mn = p; if (p > mx) mx = p }
    ImageFeatures(id, math.min(px.length, StubWidth),
      (px.length + StubWidth - 1) / StubWidth, px.length, sum, mn, mx)
  }

  /** 60-bit block-mean perceptual hash (Yang et al. block-hash family
    * — public algorithm) over the stub-decoded raster: pixel i
    * (0-based) belongs to block ⌊i·60/n⌋; bit b is set when block b's
    * mean exceeds the global mean, tested as the exact integer cross
    * product bs·n > ts·bn (no float means → bit-stable across
    * engines). 60 bits, not 64, so `1L << b` also stays in a signed
    * 64-bit lane for SQL oracles. Row-local: hashes never shuffle
    * anything but (id, long). */
  def blockMeanHash(media: Dataset[(Long, Array[Byte])]): Dataset[(Long, Long)] = {
    import media.sparkSession.implicits._
    media.map { case (id, content) =>
      val px = decodePixels(content) // STUB decode; plumbing is real
      val n = px.length.toLong
      val bs = new Array[Long](60)
      val bn = new Array[Long](60)
      var ts = 0L
      var i = 0
      while (i < px.length) {
        val b = ((i.toLong * 60L) / n).toInt
        bs(b) += px(i); bn(b) += 1; ts += px(i)
        i += 1
      }
      var h = 0L
      var b = 0
      while (b < 60) {
        if (bs(b) * n > ts * bn(b)) h |= (1L << b)
        b += 1
      }
      (id, h)
    }
  }

  /** Decode + feature-extract, one partition batch at a time. */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => features(m.media_id,
      decodePixels(m.content)))) // STUB decode; plumbing is real
  }

  /** "Resize" = stride-k subsample of the decoded raster (the stub
    * analog of bilinear downscale), then re-extract features. */
  def resizedFeatures(media: Dataset[MediaRecord],
                      stride: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodePixels(m.content)
      features(m.media_id,
        Array.range(0, px.length, stride).map(px(_)))
    })
  }

  private val M = 1000000007L

  /** Split a video payload into fixed-size frames, keep every
    * `everyNth` frame, fingerprint each (rolling 31-hash). */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   everyNth: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex.collect {
        case (fr, i) if i % everyNth == 0 =>
          val h = fr.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % M)
          Frame(m.media_id, i, h, fr.length)
      }
    })
  }

  /** Per-frame "embedding" features (sum/min/max/rolling-hash of the
    * frame's bytes — the stub analog of a frame encoder's output).
    * The decode+featurize runs in mapPartitions batches like the other
    * stub codecs; pooling over frames stays DECLARATIVE (a groupBy on
    * the returned Dataset), so Catalyst plans the aggregation —
    * swapping the stub for a real encoder UDF changes nothing
    * downstream. */
  def frameFeatures(media: Dataset[MediaRecord], frameBytes: Int,
                    everyNth: Int): Dataset[FrameFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex.collect {
        case (fr, i) if i % everyNth == 0 =>
          val px = fr.map(_ & 0xff)
          val h = px.foldLeft(0L)((acc, b) => (acc * 31 + b) % M)
          FrameFeat(m.media_id, i, px.map(_.toLong).sum, px.min,
            px.max, h)
      }
    })
  }

  /** Windowed energy (Σ sample², exact longs) over decoded samples —
    * the stub analog of framed RMS/mel features. */
  def audioEnergy(media: Dataset[MediaRecord],
                  windowSamples: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeSamples(m.content).grouped(windowSamples).zipWithIndex.map {
        case (w, i) =>
          AudioWindow(m.media_id, i, w.foldLeft(0L)((a, s) => a + s * s),
            w.length)
      }
    })
  }
}
