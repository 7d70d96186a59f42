package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode / feature-extraction
  * plumbing.
  *
  * Formats with a JVM-reachable codec are decoded FOR REAL:
  * [[decodePpmP6]] (binary PPM), [[decodeBmp24]] (24-bit BMP),
  * [[decodeWavPcm16]] (RIFF/PCM16 audio), [[decodePng]] (8-bit RGB PNG —
  * a genuinely COMPRESSED codec: zlib inflate via `java.util.zip`, CRC32
  * chunk validation, all five scanline filters), plus GIF/TIFF/WBMP and
  * JPEG via `javax.imageio` (real since r7 — see [[decodeJpeg]]),
  * AVI/MJPEG container demux, WARC record parsing, and MP3 frame-HEADER
  * metadata ([[parseMp3Frames]] — the public ISO 11172-3 header layout:
  * frame walk, bitrate/rate tables, exact duration); each is
  * oracle-checked end-to-end against analytically-constructed blobs
  * ([[syntheticPpm]]/[[syntheticBmp]]/[[syntheticWav]]/[[syntheticPngs]]).
  * Only the AUDIO/VIDEO PAYLOAD decode of the perceptual codecs with no
  * JDK decoder (MP3's MDCT, H.264) remains behind [[decodeStub]], a
  * deterministic fake producing byte-level statistics with the same
  * shape a real extractor would.
  * Everything around it —
  * schema, binary packing, partition-wise batched execution, feature
  * schema — is real Spark plumbing that a production decoder drops into.
  *
  * Scale notes: media blobs stay opaque binary end-to-end (no driver
  * collect); feature extraction is `mapPartitions` with per-partition batch
  * amortization, the Scala analog of `mapInPandas` batches.
  */
object Multimodal {

  /** Media row schema: id + media kind + raw bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("declared_width", IntegerType),
      StructField("declared_height", IntegerType),
      StructField("sample_rate", IntegerType)
    )))))

  /** Pack a text corpus into fake media rows (deterministic: bytes =
    * UTF-8 of the text) — stands in for reading real image/audio files. */
  def packFromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(64).as("declared_width"),
        lit(64).as("declared_height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decode: a real implementation would decode the codec and emit
    * pixel/sample features. This deterministic fake emits byte statistics
    * with the same fixed-length shape (8 doubles per item). */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return Array.fill(8)(0.0)
    val n = bytes.length
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < n) { val b = bytes(i) & 0xff; sum += b; if (b < min) min = b; if (b > max) max = b; i += 1 }
    val mean = sum.toDouble / n
    Array(n.toDouble, mean, min.toDouble, max.toDouble,
      (bytes(0) & 0xff).toDouble, (bytes(n - 1) & 0xff).toDouble,
      (bytes(n / 2) & 0xff).toDouble, (sum % 997).toDouble)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("features", ArrayType(DoubleType), nullable = false)))

  /** Feature extraction. The stub decoder's byte statistics are pure
    * arithmetic, so the DEFAULT path is the native codegen'd
    * [[graft.functions.ByteStats]] expression — the scan → stats pipeline
    * stays inside one whole-stage-codegen'd select, no (de)serialization
    * boundary. Input must have (media_id, kind, bytes). */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      org.apache.spark.sql.graft.bridge.columnOf(graft.functions.ByteStats(
        org.apache.spark.sql.graft.bridge.expressionOf(col("bytes")))).as("features"))

  /** Evenly sample `k` frames per media row as bounded byte slices — the
    * video analog of the decode harness. A real implementation would seek
    * the container per frame; the Spark-side plumbing here IS the real
    * thing: deterministic frame offsets (`floor(i·n/k)`), one output row
    * per frame via `posexplode`, and bounded `frameBytes` slices so a row's
    * output is k·frameBytes regardless of blob size (no multi-GB rows).
    * All per-row codegen'd expressions; blobs never leave the executor.
    * Output: `(media_id, frame_idx, frame_offset, frame_len, frame_bytes)`. */
  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int = 256): DataFrame = {
    require(k > 0 && frameBytes > 0)
    media
      .select(col("media_id"), col("meta.n_bytes").as("n"), col("bytes"),
        posexplode(expr(s"sequence(0L, ${k - 1}L)")).as(Seq("frame_idx", "i")))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        floor(col("i") * col("n") / k).cast("long").as("frame_offset"),
        least(lit(frameBytes.toLong), col("n") - floor(col("i") * col("n") / k)).as("frame_len"),
        expr(s"substring(bytes, cast(floor(i * n / $k) as int) + 1, $frameBytes)").as("frame_bytes"))
  }

  // ---------------------------------------------------------------------
  // Real decoders — everything the JVM can decode alone (incl. PNG's zlib)
  // parses actual bytes (headers, chunk layout, endianness, inflate), not a
  // stub. Perceptual codecs (JPEG/MP3/H.264) still require external
  // libraries not present in this container; their entry point remains
  // [[extractFeaturesWithDecoder]] with [[decodeStub]].
  // ---------------------------------------------------------------------

  /** Decoded image summary: dims + per-channel means. */
  val imageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Decode a binary PPM (P6) image: `P6 <ws> w <ws> h <ws> maxval <1 ws
    * byte> <w*h*3 raw RGB bytes>`, `#`-comments allowed in the header.
    * Returns None on malformed input (truncated, wrong magic, maxval > 255).
    */
  def decodePpmP6(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isPpmWs(b: Byte): Boolean = b == ' ' || b == '\t' || b == '\r' || b == '\n'
    def skipWsAndComments(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        val b = bytes(i)
        if (b == ' ' || b == '\t' || b == '\r' || b == '\n') i += 1
        else if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else going = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = -1L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = math.max(v, 0L) * 10 + (bytes(i) - '0'); i += 1
        if (v > 100000000L) return -1 // absurd header value ⇒ malformed
      }
      v.toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    // exactly ONE whitespace byte separates maxval from raw data — and it
    // must BE whitespace: skipping it unchecked accepted malformed headers
    // and shifted every pixel read by the bogus separator (r15 review)
    if (i >= bytes.length || !isPpmWs(bytes(i))) return None
    i += 1
    // dimension caps keep n*3 far from Int overflow — a crafted 65536×65536
    // header must be rejected, not wrap to a passing bounds check
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14) ||
      maxval <= 0 || maxval > 255) return None
    val n = w * h // ≤ 2^28; n*3 ≤ 3·2^28 < 2^31
    if (i.toLong + n.toLong * 3 > bytes.length) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < n) {
      sr += bytes(i + p * 3) & 0xff
      sg += bytes(i + p * 3 + 1) & 0xff
      sb += bytes(i + p * 3 + 2) & 0xff
      p += 1
    }
    Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Decode a 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB): rows are
    * stored BOTTOM-UP (top-down when height is negative), pixels are BGR,
    * and every row pads to a 4-byte boundary — three layout inversions the
    * PPM path never exercises. Same output shape as [[decodePpmP6]]
    * (width, height, per-channel means in top-down RGB space); None on any
    * malformed shape. */
  def decodeBmp24(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Int)] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    if (u32(14) < 40L) return None // BITMAPINFOHEADER or longer
    val w = u32(18).toInt; val rawH = u32(22).toInt
    val topDown = rawH < 0
    val h = math.abs(rawH)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    if (u16(26) != 1 || u16(28) != 24 || u32(30) != 0L) return None // planes/bpp/BI_RGB
    val off = u32(10)
    val rowSize = (w * 3 + 3) / 4 * 4 // padded to 4-byte boundary
    if (off < 54L || off + rowSize.toLong * h > bytes.length) return None
    // means are pixel-order-free, so they can't catch an upside-down or
    // BGR-swapped decode — the TOP-LEFT red value is the positional witness
    // (in a bottom-up file it lives in the LAST row, channel offset 2)
    var sr = 0L; var sg = 0L; var sb = 0L
    var tlR = -1
    var r = 0
    while (r < h) {
      val y = if (topDown) r else h - 1 - r // file row r ⇒ image row y
      val base = off.toInt + r * rowSize
      var x = 0
      while (x < w) {
        sb += bytes(base + x * 3) & 0xff // BGR order on disk
        sg += bytes(base + x * 3 + 1) & 0xff
        sr += bytes(base + x * 3 + 2) & 0xff
        x += 1
      }
      if (y == 0) tlR = bytes(base + 2) & 0xff
      r += 1
    }
    val n = w * h
    Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, tlR))
  }

  /** Paeth predictor (PNG filter 4): nearest of left/above/upper-left to
    * `a + b - c`, ties broken left, above, upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decode an 8-bit truecolor (RGB, color type 2, non-interlaced) PNG —
    * a REAL compressed codec: walks the chunk list verifying each CRC32,
    * concatenates the IDAT zlib stream, inflates it (`java.util.zip`), and
    * inverts the per-scanline filter (all five types: None/Sub/Up/Average/
    * Paeth). Same output shape as [[decodeBmp24]]; None on any malformed
    * shape — bad signature, CRC mismatch, wrong color mode, truncated or
    * over-long compressed stream, unknown filter type. */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Int)] =
    decodePngPixels(bytes).map { case (w, h, px) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0
      while (p < px.length) { sr += px(p); sg += px(p + 1); sb += px(p + 2); p += 3 }
      val n = w * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, px(0))
    }

  /** The full [[decodePng]] walk, returning the reconstructed RGB pixel
    * array (top-down, 3 ints per pixel) instead of summary stats — the
    * input for pixel-level features ([[dHash64]]). */
  def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != pngSig(i)) return None; i += 1 }
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var w = -1; var h = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    // chunk walk in LONG arithmetic (same discipline as the WAV walker): a
    // corrupt 32-bit length must neither wrap the cursor nor read past end
    var o = 8L
    while (!sawIend && o + 12 <= bytes.length) {
      val oi = o.toInt
      val len = u32(oi)
      if (o + 12 + len > bytes.length) return None
      val dataOff = oi + 8
      val crc = new java.util.zip.CRC32
      crc.update(bytes, oi + 4, 4 + len.toInt) // CRC covers type + data
      if (crc.getValue != u32(dataOff + len.toInt)) return None
      new String(bytes, oi + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (sawIhdr || len != 13L) return None
          sawIhdr = true
          w = u32(dataOff).toInt; h = u32(dataOff + 4).toInt
          if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
          // bit depth 8, color type 2 (truecolor), deflate, adaptive
          // filtering, no interlace — anything else is out of scope
          if (bytes(dataOff + 8) != 8 || bytes(dataOff + 9) != 2 ||
            bytes(dataOff + 10) != 0 || bytes(dataOff + 11) != 0 ||
            bytes(dataOff + 12) != 0) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) skipped
      }
      o += 12 + len
    }
    if (!sawIhdr || !sawIend) return None
    val stride = w * 3
    val rawLen = h.toLong * (1 + stride)
    if (rawLen > (1L << 26)) return None // 64 MiB decoded cap on crafted headers
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished means the stream can make no progress:
        // truncated input, or an FDICT (preset-dictionary) header — either
        // way malformed here; looping again would spin forever
        if (n == 0 && !inf.finished()) return None
        got += n
      }
      if (got < raw.length || !inf.finished()) return None // short or over-long
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter scanline by scanline, reconstructing rows in place; row y
    // lives at px[y*stride ..< (y+1)*stride] so `a`/`b`/`c` predictors read
    // the already-reconstructed current and previous rows directly
    val px = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val rowOff = y * stride
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var k = 0
      while (k < stride) {
        val a = if (k >= 3) px(rowOff + k - 3) else 0
        val b = if (y > 0) px(rowOff - stride + k) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, if (k >= 3 && y > 0) px(rowOff - stride + k - 3) else 0)
        }
        px(rowOff + k) = ((raw(base + 1 + k) & 0xff) + pred) & 0xff
        k += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Difference-hash (dHash) of a decoded RGB image: nearest-neighbor
    * sample a 9×8 grayscale grid (`gray = (r+g+b)/3`, integer), set bit
    * `y*8+x` when `gray(x,y) > gray(x+1,y)`. The standard perceptual
    * near-dup fingerprint (64 bits, robust to re-encode/resize). Returned
    * as two non-negative 32-bit halves `(hi, lo)` so downstream SQL — and
    * the DuckDB oracle — never touches the BIGINT sign bit. */
  def dHash64(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    def gray(gx: Int, gy: Int): Int = {
      val o = ((gy * h / 8) * w + (gx * w / 9)) * 3
      (px(o) + px(o + 1) + px(o + 2)) / 3
    }
    var lo = 0L; var hi = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gx, gy) > gray(gx + 1, gy)) {
          val j = gy * 8 + gx
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (hi, lo)
  }

  /** Decoded audio summary: rate + sample count + amplitude stats. */
  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))

  /** THE RIFF/WAVE chunk walk — the single strict walk every WAV decoder
    * builds on (it was triplicated; VERDICT r15 #3): locate `fmt ` (must
    * be format 1 = uncompressed PCM, 16-bit, MONO — interleaved
    * multi-channel words would silently skew every sample statistic) and
    * `data`, with chunk offsets in LONG arithmetic so a corrupt 32-bit
    * size field neither wraps the cursor (infinite loop / negative index)
    * nor lets a declared-past-the-end payload through — every malformed
    * shape → None. Returns (sample_rate, data_offset, n_samples). */
  private def walkWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var rate = -1
    var dataOff = -1; var dataLen = -1L
    var o = 12L
    while (o + 8 <= bytes.length) {
      val oi = o.toInt
      val id = tag(oi); val sz = u32(oi + 4) // unsigned, in [0, 2^32)
      val payload = o + 8
      if (id == "fmt ") {
        if (sz < 16 || payload + 16 > bytes.length) return None
        val p = payload.toInt
        if (u16(p) != 1 || u16(p + 2) != 1 || u16(p + 14) != 16) return None
        rate = u32(p + 4).toInt
      } else if (id == "data") {
        if (payload + sz > bytes.length) return None
        dataOff = payload.toInt; dataLen = sz
      }
      o = payload + sz + (sz & 1L) // word-aligned; strictly advances ≥ 8
    }
    if (rate <= 0 || dataOff < 0 || dataOff + dataLen > bytes.length) return None
    Some((rate, dataOff, (dataLen / 2).toInt))
  }

  /** Read little-endian int16 sample `i` of a walked data chunk. */
  @inline private def wavSample(bytes: Array[Byte], dataOff: Int, i: Int): Short =
    (((bytes(dataOff + i * 2) & 0xff) |
      ((bytes(dataOff + i * 2 + 1) & 0xff) << 8)).toShort)

  /** Decode a PCM16 WAV (RIFF) blob via [[walkWavPcm16]], then reduce the
    * little-endian int16 samples to (rate, n, mean, peak). Returns None on
    * malformed input. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Long, Double, Long)] =
    walkWavPcm16(bytes).map { case (rate, dataOff, n) =>
      var sum = 0L; var peak = 0L
      var s = 0
      while (s < n) {
        val v = wavSample(bytes, dataOff, s).toLong
        sum += v
        val a = math.abs(v); if (a > peak) peak = a
        s += 1
      }
      if (n == 0) (rate, 0L, 0.0, 0L)
      else (rate, n.toLong, sum.toDouble / n, peak)
    }

  /** Windowed audio features over a PCM16 WAV: the stream is cut into
    * consecutive FULL frames of `frameSize` samples (a trailing partial
    * frame is dropped) and each frame yields the standard audio-QC
    * measures — amplitude sum, peak, frame-local zero crossings
    * (sign(s[i]) ≠ sign(s[i-1]), zero counted non-negative), and RMS
    * (`sqrt(Σx²/frameSize)` — the sum of squares is an exact integer, so
    * the double is reproducible). Returns one tuple per frame:
    * (frame_idx, sum_amp, peak_abs, zero_crossings, rms). */
  def decodeWavFrames(bytes: Array[Byte], frameSize: Int): Option[Seq[(Int, Long, Long, Long, Double)]] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    decodeWavFramesRaw(bytes, frameSize).map { frames =>
      frames.zipWithIndex.map { case (smp, f) =>
        var sum = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
        var prevNonNeg = false
        var i = 0
        while (i < frameSize) {
          val v = smp(i).toLong
          sum += v; sumSq += v * v
          val a = math.abs(v); if (a > peak) peak = a
          val nonNeg = v >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          i += 1
        }
        (f, sum, peak, zc, math.sqrt(sumSq.toDouble / frameSize))
      }
    }
  }

  /** [[audioFrames]] row shape. */
  val audioFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Per-frame audio features for every PCM16 WAV blob (malformed rows
    * dropped) — one mapPartitions pass, frames generated per row. */
  def audioFrames(media: DataFrame, frameSize: Int): DataFrame = {
    // validate DRIVER-SIDE: a require inside the decode closure lands in
    // decodeRow's Try, so a misconfigured frameSize silently produced an
    // EMPTY result instead of failing fast (r15 review finding)
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeWavFrames(_, frameSize)).toSeq.flatten.map {
          case (f, sum, peak, zc, rms) => Row(r.getLong(0), f, sum, peak, zc, rms)
        }
      }
    }(Encoders.row(audioFrameSchema))
  }

  // ---- Audio spectral fingerprinting (Walsh–Hadamard constellation) ----

  /** In-place fast Walsh–Hadamard transform (natural/Hadamard order):
    * `c(k) = Σ_i x(i) · (−1)^popcount(i AND k)` — the EXACT-INTEGER
    * "spectrum" the audio fingerprint peaks on. Integer addition is
    * associative, so the coefficients are bit-identical on any engine and
    * any evaluation order (the property a float DFT cannot give an
    * oracle); |c| ≤ n·32768 keeps everything far inside a long. */
  private[graft] def fwht(c: Array[Long]): Unit = {
    val n = c.length
    var len = 1
    while (len < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + len) {
          val a = c(j); val b = c(j + len)
          c(j) = a + b; c(j + len) = a - b
          j += 1
        }
        i += len * 2
      }
      len *= 2
    }
  }

  /** Per-frame spectral peak of a PCM16 WAV: the stream is cut into FULL
    * `frameSize`-sample frames (trailing partial dropped, the
    * [[decodeWavFrames]] rule), each frame is Walsh–Hadamard transformed,
    * and the peak is the non-DC coefficient k (1 ≤ k < frameSize)
    * maximizing |c(k)|, ties to the SMALLEST k. `frameSize` must be a
    * power of two. Returns (frame_idx, peak_k, peak_abs) per frame. */
  def decodeWavWhtPeaks(bytes: Array[Byte], frameSize: Int): Option[Seq[(Int, Int, Long)]] =
    decodeWavFramesRaw(bytes, frameSize).map(frames =>
      whtPeaksOfSamples(frames.toArray.flatten, frameSize))

  /** The per-frame WHT peak scan over a raw sample array (trailing partial
    * frame dropped) — shared by the WAV path and the AVI soundtrack path. */
  private[graft] def whtPeaksOfSamples(smp: Array[Short], frameSize: Int): Seq[(Int, Int, Long)] = {
    require(frameSize > 1 && (frameSize & (frameSize - 1)) == 0 && frameSize <= 4096,
      s"frameSize must be a power of two in [2, 4096], got $frameSize")
    val nFrames = smp.length / frameSize
    (0 until nFrames).map { f =>
      val c = new Array[Long](frameSize)
      var i = 0
      while (i < frameSize) { c(i) = smp(f * frameSize + i).toLong; i += 1 }
      fwht(c)
      var bestK = 1; var bestA = math.abs(c(1))
      var k = 2
      while (k < frameSize) {
        val a = math.abs(c(k))
        if (a > bestA) { bestA = a; bestK = k }
        k += 1
      }
      (f, bestK, bestA)
    }
  }

  /** Landmark pairs over a peak-k sequence — shared key packing for every
    * fingerprint producer (batch window, blob-local, soundtrack). */
  private[graft] def localFpsOfPeaks(ks: IndexedSeq[Int], maxDelta: Int): Seq[(Int, Long)] = {
    require(maxDelta >= 1 && maxDelta < 64, s"maxDelta must be in [1, 64), got $maxDelta")
    for {
      f <- ks.indices
      d <- 1 to maxDelta
      if f + d < ks.length
    } yield (f, (ks(f).toLong * 4096L + ks(f + d)) * 64L + d)
  }

  /** [[walkWavPcm16]] cut to raw per-frame sample arrays (full frames
    * only, trailing partial dropped) — the framed base every windowed
    * audio decoder shares. */
  private def decodeWavFramesRaw(bytes: Array[Byte], frameSize: Int): Option[Seq[Array[Short]]] =
    walkWavPcm16(bytes).map { case (_, dataOff, n) =>
      val nFrames = n / frameSize
      val out = Vector.newBuilder[Array[Short]]
      var f = 0
      while (f < nFrames) {
        val smp = new Array[Short](frameSize)
        var i = 0
        while (i < frameSize) {
          smp(i) = wavSample(bytes, dataOff, f * frameSize + i); i += 1
        }
        out += smp
        f += 1
      }
      out.result()
    }

  /** [[audioWhtPeaks]] row shape. */
  val whtPeakSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("peak_k", IntegerType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))

  /** Per-frame Walsh–Hadamard spectral peaks for every PCM16 WAV blob
    * (malformed rows dropped) — one mapPartitions codec pass, the audio
    * analog of [[imageDHashes]]: the peak sequence is the compact
    * perceptual summary fingerprinting and matching build on. */
  def audioWhtPeaks(media: DataFrame, frameSize: Int): DataFrame = {
    require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a positive power of two, got $frameSize")
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeWavWhtPeaks(_, frameSize)).toSeq.flatten.map {
          case (f, k, a) => Row(r.getLong(0), f, k, a)
        }
      }
    }(Encoders.row(whtPeakSchema))
  }

  /** Landmark (constellation) fingerprints from a [[audioWhtPeaks]] frame —
    * the Shazam shape (Wang 2003): each anchor frame pairs its spectral
    * peak with the peaks of the next `maxDelta` frames, and the triple
    * (anchor peak, target peak, Δframes) packs into one integer key
    * `((p1·4096 + p2)·64 + Δ)`. A trimmed or time-shifted copy shares
    * most keys with its source at a constant frame offset, which is what
    * [[matchAudioFingerprints]] votes on.
    *
    * Scale shape: ONE window pass per media (all `maxDelta` leads computed
    * in the same per-media frame ordering — per-entity state, bounded by
    * one media's frame count), then a map-side posexplode. No self-join of
    * the peak table. */
  def audioFingerprints(peaks: DataFrame, maxDelta: Int = 2): DataFrame = {
    require(maxDelta >= 1 && maxDelta < 64, s"maxDelta must be in [1, 64), got $maxDelta")
    val byMedia = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val leads = array((1 to maxDelta).map(d =>
      lead(col("peak_k"), d).over(byMedia)): _*)
    peaks
      // windows first, generator second: Spark disallows a generator over
      // window expressions inside one projection
      .select(col("media_id"), col("frame_idx"), col("peak_k").as("_p1"),
        leads.as("_leads"))
      .select(col("media_id"), col("frame_idx"), col("_p1"),
        posexplode(col("_leads")).as(Seq("_dm1", "_p2")))
      .filter(col("_p2").isNotNull)
      .select(col("media_id"), col("frame_idx"),
        ((col("_p1").cast("long") * 4096L + col("_p2")) * 64L +
          col("_dm1") + 1L).as("fp_key"))
  }

  /** Shazam-style offset-histogram matching: probe fingerprints equi-join
    * corpus fingerprints on `fp_key` (candidate cost ∝ key collisions,
    * NEVER probes × corpus), each hit votes for (corpus media, frame
    * offset), and the best (votes DESC, media ASC, offset ASC) bucket per
    * probe wins. A true trimmed copy concentrates all its votes at one
    * constant offset — random collisions scatter.
    *
    * Both aggregations are map-side combinable; the per-probe argmax is a
    * bounded struct-max aggregate, not a window. Output: (probe_id,
    * media_id, offset_frames, votes). */
  def matchAudioFingerprints(probeFps: DataFrame, corpusFps: DataFrame): DataFrame = {
    // shuffle_hash on the probe side: both inputs are typed decode
    // pipelines with no size stats, and Spark's fallback guess would
    // BROADCAST the corpus fingerprint table — a corpus-sized driver OOM
    // at scale (the nearDupImages lesson). The hash join shuffles both
    // sides on fp_key and builds from the (small) probe partitions.
    val p = probeFps.select(col("media_id").as("probe_id"),
      col("frame_idx").as("_pf"), col("fp_key")).hint("shuffle_hash")
    val c = corpusFps.select(col("media_id"), col("frame_idx").as("_cf"), col("fp_key"))
    p.join(c, Seq("fp_key"))
      .groupBy(col("probe_id"), col("media_id"),
        (col("_cf") - col("_pf")).as("offset_frames"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("probe_id"))
      .agg(max(struct(col("votes"), (-col("media_id")).as("_m"),
        (-col("offset_frames")).as("_o"))).as("_best"))
      .select(col("probe_id"), (-col("_best._m")).as("media_id"),
        (-col("_best._o")).cast("long").as("offset_frames"), col("_best.votes").as("votes"))
  }

  /** [[audioFingerprints]] computed BLOB-LOCALLY inside the decoder: one
    * track's frames all live in its own byte stream, so the Δ-lead pairs
    * need no window at all — which is what makes this variant legal on a
    * STREAMING DataFrame (window functions are not; the batch operator
    * keeps the window so fingerprinting composes with any peaks frame,
    * e.g. one filtered or unioned across decodes). Key packing is
    * identical, so batch and streaming fingerprints interoperate. */
  def decodeWavLocalFingerprints(bytes: Array[Byte], frameSize: Int,
      maxDelta: Int): Option[Seq[(Int, Long)]] =
    decodeWavWhtPeaks(bytes, frameSize).map(peaks =>
      localFpsOfPeaks(peaks.map(_._2).toIndexedSeq, maxDelta))

  /** [[whtPeakSchema]] sibling for local fingerprints. */
  val localFpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("fp_key", LongType, nullable = false)))

  /** Per-blob landmark fingerprints for every PCM16 WAV (malformed rows
    * dropped) — stateless per row, streaming-safe. */
  def audioLocalFingerprints(media: DataFrame, frameSize: Int,
      maxDelta: Int = 2): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeWavLocalFingerprints(_, frameSize, maxDelta)).toSeq.flatten.map {
          case (f, key) => Row(r.getLong(0), f, key)
        }
      }
    }(Encoders.row(localFpSchema))

  /** Persist an audio fingerprint index: the fingerprint table as parquet
    * plus a params file pinning (frameSize, maxDelta) — the two knobs a
    * probe MUST be fingerprinted with for keys to be comparable. The
    * nightly-index / streaming-probe split ([[graft.pipeline.Dedup]]
    * artifact discipline): the index is insert-only; rebuild on a param
    * change. */
  def writeAudioIndex(fps: DataFrame, dir: String, frameSize: Int,
      maxDelta: Int): Unit = {
    fps.select(col("media_id"), col("frame_idx"), col("fp_key"))
      .write.mode("overwrite").parquet(s"$dir/fps")
    val spark = fps.sparkSession
    import spark.implicits._
    Seq((frameSize, maxDelta)).toDF("frame_size", "max_delta")
      .coalesce(1).write.mode("overwrite").json(s"$dir/params")
  }

  /** Read a [[writeAudioIndex]] index; `requireParams` rejects an index
    * built with different fingerprint knobs instead of silently returning
    * incomparable keys. Returns the fingerprint frame. */
  def readAudioIndex(spark: SparkSession, dir: String,
      requireFrameSize: Int, requireMaxDelta: Int): DataFrame = {
    val p = spark.read.json(s"$dir/params").collect().head
    val fs = p.getAs[Long]("frame_size"); val md = p.getAs[Long]("max_delta")
    require(fs == requireFrameSize && md == requireMaxDelta,
      s"audio index at $dir was built with (frameSize=$fs, maxDelta=$md), " +
        s"probe uses ($requireFrameSize, $requireMaxDelta) — rebuild the index")
    spark.read.parquet(s"$dir/fps")
  }

  /** Decode every `bytes` blob as a PPM image (malformed rows dropped) —
    * batch-shaped like [[extractFeaturesWithDecoder]]: per-partition setup,
    * rows streamed, blobs never leave the executor. */
  /** "Malformed rows DROPPED" as a harness guarantee, not per-decoder
    * discipline: null blobs and any decoder throwable both degrade to a
    * skipped row — one bad byte sequence must never fail a 100 TB job. */
  private def decodeRow[T](r: Row, decode: Array[Byte] => Option[T]): Option[T] =
    // positional: [[idAndBytes]] pins (media_id, bytes), and rows arriving
    // from an adjacent typed operator (EliminateSerialization) may carry no
    // schema for a by-name lookup
    Option(r.getAs[Array[Byte]](1))
      .flatMap(b => scala.util.Try(decode(b)).toOption.flatten)

  /** `media_id` widened to long for the decode row shape; any non-integral
    * id type fails HERE at plan time instead of as an executor-side
    * ClassCastException mid-job (same guard as DataMix.samplePerGroup). */
  private def idAndBytes(media: DataFrame): DataFrame = {
    val idType = media.schema("media_id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"decode needs an integral media_id column, got ${idType.simpleString}")
    media.select(col("media_id").cast("long").as("media_id"), col("bytes"))
  }

  def decodeImages(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodePpmP6)
          .map { case (w, h, mr, mg, mb) => Row(r.getLong(0), w, h, mr, mg, mb) }
      }
    }(Encoders.row(imageSchema))

  /** [[decodeBmp24]] row shape: the PPM image stats + the positional
    * top-left red witness. */
  val bmpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("tl_r", IntegerType, nullable = false)))

  /** Decode every `bytes` blob as a 24-bit BMP (malformed rows dropped). */
  def decodeBmps(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeBmp24)
          .map { case (w, h, mr, mg, mb, tl) => Row(r.getLong(0), w, h, mr, mg, mb, tl) }
      }
    }(Encoders.row(bmpSchema))

  /** [[decodePng]] shares the BMP row shape (dims + channel means + the
    * positional top-left red witness). */
  val pngSchema: StructType = bmpSchema

  /** Decode every `bytes` blob as an 8-bit RGB PNG (malformed rows dropped). */
  def decodePngs(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodePng)
          .map { case (w, h, mr, mg, mb, tl) => Row(r.getLong(0), w, h, mr, mg, mb, tl) }
      }
    }(Encoders.row(pngSchema))

  /** [[imageDHashes]] row shape: dims + the 64-bit dHash as two unsigned
    * 32-bit halves. */
  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("hash_hi", LongType, nullable = false),
    StructField("hash_lo", LongType, nullable = false)))

  /** Decode the RGB pixel plane of a PNG, GIF, TIFF, or WBMP blob,
    * dispatched on the magic bytes — the multi-format entry the
    * perceptual pipeline hashes through. */
  def decodeImagePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == pngSig(i)))
      decodePngPixels(bytes)
    else if (bytes.length >= 4 &&
      ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M')))
      decodeTiffPixels(bytes)
    else if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0)
      decodeWbmpPixels(bytes)
    else decodeGifPixels(bytes)

  /** Perceptual fingerprint of every image blob (PNG, GIF, or TIFF, by magic):
    * full decode → [[dHash64]] (malformed rows dropped). One mapPartitions
    * pass, per-row memory bounded by the decode cap. */
  def imageDHashes(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeImagePixels)
          .map { case (w, h, px) =>
            val (hi, lo) = dHash64(w, h, px)
            Row(r.getLong(0), w, h, hi, lo)
          }
      }
    }(Encoders.row(dhashSchema))

  /** Image near-duplicate pairs by dHash Hamming distance, via LSH-style
    * banding: the 64-bit hash splits into four 16-bit bands; only pairs
    * sharing at least one band value are compared. For `maxDist < 4` the
    * pigeonhole principle makes this EXACT (a pair within distance 3 cannot
    * differ in all 4 bands), so the banded plan — candidate space ∝ band
    * collisions, never all-pairs — returns byte-identically what a
    * brute-force cross join would, at 100 TB candidate-join cost instead of
    * O(n²). Output: (a, b, dist) with a < b, one row per pair. */
  /** Explode a dHash frame into its four 16-bit LSH bands: one row per
    * (image, band) with the band's value — the candidate key both the batch
    * near-dup join and the streaming image admission bucket on. */
  def dhashBands(hashes: DataFrame): DataFrame =
    hashes.select(
      col("media_id"), col("hash_hi"), col("hash_lo"),
      posexplode(array(
        col("hash_lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("hash_lo"), 16).bitwiseAND(lit(0xffffL)),
        col("hash_hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("hash_hi"), 16).bitwiseAND(lit(0xffffL)))).as(Seq("band", "bv")))

  def nearDupImages(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"banding over 4 bands is exact only for maxDist < 4, got $maxDist")
    // pinned-width exchange on the join key: a band self-join fans out
    // ~10-100× (collisions), and AQE's coalescing is OUTPUT-BLIND — it
    // sized this exchange by the (tiny) hash-table input and ran the whole
    // 1.6M-pair explosion on ONE task (r17 stage profile: 2.0 s of a 2.4 s
    // op). An explicit partition count (the session's shuffle width, so a
    // real cluster's configured parallelism carries through) keeps the
    // fan-out spread; both aliases still canonicalize to one exchange.
    val width = hashes.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val banded = dhashBands(hashes).repartition(width, col("band"), col("bv"))
    // self-join with BOTH sides the identical subplan (aliases applied
    // above the join, not below) and a merge-join hint: the two (band, bv)
    // shuffle exchanges canonicalize equal, so the decode pipeline runs
    // ONCE and the second side is a ReusedExchange. Without the hint Spark
    // broadcasts one side (typed decode pipelines carry no size stats), a
    // corpus-sized driver OOM at scale AND a second full decode of every
    // blob — both plan-pinned against.
    val l = banded.alias("l").hint("merge")
    val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
        col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("a"), col("r.media_id").as("b"),
        (expr("bit_count(l.hash_hi ^ r.hash_hi)") +
          expr("bit_count(l.hash_lo ^ r.hash_lo)")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Video near-duplicate pairs by SHARED FRAME FINGERPRINTS: two videos
    * match on every distinct frame key they have in common (the CDN /
    * content-matching shape — trimmed or shifted copies share most frame
    * keys). `keyCols` picks the fingerprint: the exact content key
    * (default — matches pixel-identical frames only) or the perceptual
    * dHash halves (tolerates re-encoding, but near-featureless frames
    * collide and densify the candidate space). Candidates come from an
    * equi-join on the key — cost ∝ key collisions, never all video pairs —
    * and the per-pair overlap is one aggregation. `sim_ppm` = shared
    * distinct keys · 1e6 / min(distinct keys of either side), truncated.
    *
    * Input: a [[videoFrameDHashes]] frame. Output: (a, b, shared,
    * sim_ppm) for pairs with `shared >= minShared`, a < b. */
  def nearDupVideos(frameHashes: DataFrame, minShared: Int = 1,
      keyCols: Seq[String] = Seq("frame_key")): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(keyCols.nonEmpty, "nearDupVideos needs at least one key column")
    // distinct (video, key): a frame repeated WITHIN a video must not
    // multiply the pair count. persist(): the frame is consumed by THREE
    // branches (both join sides + the per-video totals) — exchange reuse
    // covers the join sides, but without the cache the totals branch
    // re-runs the whole decode pipeline
    val vh = frameHashes.select((col("media_id") +: keyCols.map(col)): _*)
      .distinct().persist()
    val perVideo = vh.groupBy("media_id").agg(count(lit(1)).as("n_hashes"))
    // join strategy left to AQE: it sees the CACHED table's runtime size,
    // broadcasting when the hash table is small and falling back to a
    // sort-merge join (with the two sides reusing one exchange) at scale —
    // strictly better than pinning either strategy at plan time
    val l = vh.alias("l")
    val r = vh.alias("r")
    val pairs = l.join(r, keyCols.map(k => col(s"l.$k") === col(s"r.$k"))
        .reduce(_ && _) && col("l.media_id") < col("r.media_id"))
      .groupBy(col("l.media_id").as("a"), col("r.media_id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(perVideo.select(col("media_id").as("a"), col("n_hashes").as("na")), Seq("a"))
      .join(perVideo.select(col("media_id").as("b"), col("n_hashes").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("shared"),
        expr("(shared * 1000000) div least(na, nb)").as("sim_ppm"))
    // materialize the (small, collision-bounded) pair table eagerly via
    // localCheckpoint, then release the frame cache — repeated invocations
    // must not accumulate decoded-frame blocks (the checkpoint blocks are
    // pair-sized and ContextCleaner-reclaimed once the result is dropped)
    val out = pairs.localCheckpoint()
    vh.unpersist(blocking = false)
    out
  }

  /** Scene-cut detection over a [[videoFrameDHashes]] frame: a frame opens
    * a new scene when its perceptual distance to the PREVIOUS frame
    * exceeds `cutDist` (frame 0 always does). The window partitions by
    * video and orders by frame index — per-video state, bounded by one
    * video's frame count, the standard shape for per-asset sequence
    * features (a video's frames must co-locate anyway).
    *
    * Output: one row per frame — media_id, frame_idx, `dist` (Hamming to
    * the previous frame, 0 for frame 0), `is_cut`, and `scene_idx` (0-based
    * running count of cuts up to and including this frame, minus one). */
  def sceneCuts(frameHashes: DataFrame, cutDist: Int = 8): DataFrame = {
    require(cutDist >= 0, s"cutDist must be non-negative, got $cutDist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    frameHashes
      .select(col("media_id"), col("frame_idx"), col("hash_hi"), col("hash_lo"))
      .withColumn("_phi", lag(col("hash_hi"), 1).over(w))
      .withColumn("_plo", lag(col("hash_lo"), 1).over(w))
      .withColumn("dist", when(col("_phi").isNull, lit(0L)).otherwise(
        (expr("bit_count(hash_hi ^ _phi)") + expr("bit_count(hash_lo ^ _plo)")).cast("long")))
      .withColumn("is_cut", col("_phi").isNull || col("dist") > cutDist)
      .withColumn("scene_idx", sum(col("is_cut").cast("long")).over(run) - 1)
      .select(col("media_id"), col("frame_idx"), col("dist"), col("is_cut"), col("scene_idx"))
  }

  /** Decode every `bytes` blob as a PCM16 WAV (malformed rows dropped). */
  def decodeAudio(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeWavPcm16)
          .map { case (rate, n, mean, peak) => Row(r.getLong(0), rate, n, mean, peak) }
      }
    }(Encoders.row(audioSchema))

  import org.apache.spark.sql.Column

  /** Hex string of one byte-valued column (for `unhex` blob synthesis). */
  private def hexByte(v: Column): Column = lpad(hex(v), 2, "0")

  /** A VALID binary-PPM (P6) blob synthesized per row: pixel byte j is
    * `(id*31 + j*7) mod 256` — an analytic formula, so an oracle can verify
    * the DECODED features without decoding anything itself. Built entirely
    * from codegen'd expressions (header literal ++ unhex of generated hex
    * pairs): no UDF, streams at any scale. */
  /** Magic-byte container sniffing — the dispatcher in front of every
    * decoder: crawl media arrives untyped (extensions lie, Content-Type
    * lies more), so the FIRST pass over the blob column routes each row to
    * its decoder by file signature. Pure `substring`-on-binary Column
    * expressions — codegen'd, no UDF, no byte copy beyond the prefix
    * slice; RIFF containers disambiguate on the form tag at offset 9.
    * WBMP's "signature" (0x00 0x00) is genuinely weak — it is matched
    * LAST, as real sniffers do. Unknown/short blobs report "unknown". */
  def sniffFormat(bytes: Column): Column = {
    def p(n: Int) = substring(bytes, 1, n)
    def b(xs: Int*) = lit(xs.map(_.toByte).toArray)
    def s4(off: Int, s: String) = substring(bytes, off, s.length) === lit(s.getBytes("US-ASCII"))
    when(bytes.isNull || length(bytes) < 2, lit("unknown"))
      .when(p(8) === b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), lit("png"))
      .when(p(2) === b(0xff, 0xd8), lit("jpeg"))
      .when(s4(1, "GIF8"), lit("gif"))
      .when(p(4) === b('I', 'I', 0x2a, 0x00) ||
        p(4) === b('M', 'M', 0x00, 0x2a), lit("tiff"))
      .when(s4(1, "RIFF") && s4(9, "WAVE"), lit("wav"))
      .when(s4(1, "RIFF") && s4(9, "AVI "), lit("avi"))
      .when(s4(1, "BM"), lit("bmp"))
      .when(s4(1, "P6"), lit("ppm"))
      .when(s4(1, "WARC/"), lit("warc"))
      .when(p(2) === b(0x1f, 0x8b), lit("gzip"))
      // MPEG-1 Layer III frame sync (with/without CRC) or an ID3v2 tag —
      // matched AFTER jpeg (0xff 0xd8 is disjoint from 0xff 0xfa/0xfb)
      .when(s4(1, "ID3") || p(2) === b(0xff, 0xfb) || p(2) === b(0xff, 0xfa),
        lit("mp3"))
      .when(p(2) === b(0x00, 0x00), lit("wbmp"))
      .otherwise(lit("unknown"))
  }

  def syntheticPpm(id: Column, w: Int, h: Int): Column = {
    val header = lit(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    val body = unhex(concat_ws("", transform(
      sequence(lit(0L), lit(w.toLong * h * 3 - 1)),
      j => hexByte(pmod(id.cast("long") * 31 + j * 7, lit(256L))))))
    concat(header, body)
  }

  /** A VALID 24-bit bottom-up BMP blob per row carrying the SAME logical
    * image as [[syntheticPpm]] (channel value at top-down RGB index j is
    * `(id*31 + j*7) mod 256`) — but serialized through BMP's three layout
    * inversions: rows bottom-up, pixels BGR, rows padded to 4 bytes. The
    * oracle verifies the DECODED stats from the logical formula, so a
    * decoder that misses any inversion mismatches. */
  def syntheticBmp(id: Column, w: Int, h: Int): Column = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val pad = rowSize - w * 3
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val header = lit(bb.array())
    val idL = id.cast("long")
    val body = unhex(concat_ws("", transform(sequence(lit(0L), lit(h - 1L)), fr => {
      val y = lit(h - 1L) - fr // bottom-up: file row fr holds image row y
      val rowHex = concat_ws("", transform(sequence(lit(0L), lit(w - 1L)), x =>
        concat(Seq(2, 1, 0).map(c => // BGR on disk
          hexByte(pmod(idL * 31 + ((y * w + x) * 3 + lit(c.toLong)) * 7, lit(256L)))): _*)))
      if (pad == 0) rowHex else concat(rowHex, lit("00" * pad))
    })))
    concat(header, body)
  }

  /** A VALID PCM16 mono WAV blob per row: sample i's unsigned word is
    * `u = (id*13 + (startSample + i)*97) mod 65536`, written little-endian —
    * its int16 (two's-complement) value is `u` when u < 32768, else
    * `u - 65536`. Same analytic construction as [[syntheticPpm]].
    * `startSample` phase-shifts the stream: the blob carries samples
    * `startSample until startSample + nSamples` of the id's infinite
    * sample sequence, so a shifted blob is a TRIMMED COPY of a longer one
    * — the probe shape audio fingerprint matching must recognize. */
  def syntheticWav(id: Column, nSamples: Int, sampleRate: Int,
      startSample: Int = 0): Column = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val header = lit(bb.array())
    val body = unhex(concat_ws("", transform(
      sequence(lit(0L), lit(nSamples.toLong - 1)),
      i => {
        val u = pmod(id.cast("long") * 13 + (i + lit(startSample.toLong)) * 97, lit(65536L))
        concat(hexByte(pmod(u, lit(256L))), hexByte(shiftright(u, 8)))
      })))
    concat(header, body)
  }

  /** A VALID PCM16 mono WAV with SILENT FRAMES for the VAD gate: 64-sample
    * frame g of track id is near-silence (samples `u mod 16`, peak ≤ 15)
    * when `(g + id) mod 3 == 0`, else the full [[syntheticWav]] sequence
    * `(id·13 + i·97) mod 65536`. An active frame's peak is PROVABLY
    * ≥ 1000: its 64 samples step by 97 and span 6208 consecutive values
    * mod 65536, which cannot fit inside the 2000-wide |int16| < 1000
    * band — so any threshold in (15, 1000] separates the frame classes
    * analytically, and the oracle needs only the (g + id) mod 3 rule,
    * never a sample replay. */
  def syntheticGatedWav(id: Column, nSamples: Int, sampleRate: Int): Column = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val header = lit(bb.array())
    val body = unhex(concat_ws("", transform(
      sequence(lit(0L), lit(nSamples.toLong - 1)),
      i => {
        val u = pmod(id.cast("long") * 13 + i * 97, lit(65536L))
        val silent = pmod(shiftright(i, 6) + id.cast("long"), lit(3L)) === 0
        val v = when(silent, pmod(u, lit(16L))).otherwise(u)
        concat(hexByte(pmod(v, lit(256L))), hexByte(shiftright(v, 8)))
      })))
    concat(header, body)
  }

  /** Voice-activity detection over PCM16 WAVs — the speech/silence
    * segmentation a speech-data pipeline runs before transcription or
    * soundtrack alignment: frames whose peak amplitude reaches
    * `peakThreshold` are active, consecutive active frames (allowing
    * gaps of up to `maxGapFrames` inactive frames — the standard
    * hangover) merge into segments, and segments shorter than
    * `minFrames` are dropped as clicks.
    *
    * Scale shape: the per-frame features come from the one-pass
    * [[audioFrames]] decoder; the merge IS gap-sessionization on the
    * frame index ([[EventAnalytics.sessionize]] — one hash(media)
    * exchange, windows + collapse on the same key).
    *
    * Output: `(media_id, seg_idx, start_frame, end_frame, n_active,
    * span_frames)` — `span_frames` counts bridged gaps, `n_active` only
    * the active frames. */
  def voiceActivity(media: DataFrame, frameSize: Int, peakThreshold: Long,
      maxGapFrames: Int = 0, minFrames: Int = 1): DataFrame = {
    require(peakThreshold >= 0 && maxGapFrames >= 0 && minFrames >= 1,
      s"bad VAD params: thr=$peakThreshold gap=$maxGapFrames min=$minFrames")
    EventAnalytics.sessionize(
      audioFrames(media, frameSize)
        .filter(col("peak_abs") >= peakThreshold)
        .select(col("media_id"), col("frame_idx").cast("long").as("_f")),
      "media_id", "_f", "_f", gapSec = maxGapFrames + 1L)
      .filter(col("n_events") >= minFrames)
      .select(col("media_id"), col("session_idx").as("seg_idx"),
        col("start_ts").as("start_frame"), col("end_ts").as("end_frame"),
        col("n_events").as("n_active"),
        (col("end_ts") - col("start_ts") + 1).as("span_frames"))
  }

  /** A VALID PCM16 mono WAV whose 64-sample frames are pure WALSH TONES:
    * global sample t (= startSample + i) of track id is
    * `1000 · (−1)^popcount((t mod 64) AND K)` with the per-frame tone
    * `K(id, g) = 1 + (id·5 + ((2g) mod 5)·(7 + id mod 11)) mod 63`,
    * g = t div 64. The 64-point WHT of a Walsh function is a delta, so
    * frame g's spectral peak is EXACTLY K(id, g) (|c| = 64000) — an
    * analytically-known peak sequence that is DISTINCT across tracks at
    * every alignment: same-position collisions need id ≡ id′ (mod 693),
    * and the PERMUTED stride positions `(2g) mod 5` (not g itself — an
    * arithmetic-in-g sequence would make every same-stride track a
    * shifted copy of every other) make cross-offset aliasing require
    * `5·stride ≡ 0 (mod 63)`, impossible for strides 7..17. That is what
    * makes fingerprint matching demonstrably discriminative (the ramp
    * [[syntheticWav]] is spectrally degenerate — every track peaks
    * alike). `startSample` must be a multiple of 64 so probe frames stay
    * tone-aligned trims of the source. */
  def syntheticWalshWav(id: Column, nSamples: Int, sampleRate: Int,
      startSample: Int = 0): Column = {
    require(startSample % 64 == 0, s"startSample must be a multiple of 64, got $startSample")
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val header = lit(bb.array())
    val idL = id.cast("long")
    val body = unhex(concat_ws("", transform(
      sequence(lit(0L), lit(nSamples.toLong - 1)),
      i => {
        val t = i + lit(startSample.toLong)
        val g = floor(t / 64).cast("long")
        val j = pmod(t, lit(64L))
        val k = lit(1L) + pmod(
          idL * 5 + pmod(g * 2, lit(5L)) * (lit(7L) + pmod(idL, lit(11L))), lit(63L))
        val x = lit(1000L) - lit(2000L) * pmod(bit_count(j.bitwiseAND(k)).cast("long"), lit(2L))
        val u = pmod(x, lit(65536L))
        concat(hexByte(pmod(u, lit(256L))), hexByte(shiftright(u, 8)))
      })))
    concat(header, body)
  }

  /** One PNG chunk: BE length + type + data + CRC32(type ++ data). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length) // BIG endian (default)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** A VALID 8-bit RGB PNG carrying the SAME logical image as
    * [[syntheticPpm]] (channel value at top-down RGB index j is
    * `(id*31 + j*7) mod 256`) — but serialized through PNG's real pipeline:
    * scanline y gets filter type `(id + y) mod 5` (so a corpus sweep
    * exercises ALL five filters), the filtered stream is zlib-DEFLATED, and
    * the IDAT payload is split across two chunks (multi-IDAT concatenation
    * is part of the format). The oracle verifies the DECODED stats from the
    * logical formula, so the decoder must really invert zlib + filtering. */
  def buildSyntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val ft = Math.floorMod(id + y, 5).toInt
      val base = y * (1 + stride)
      raw(base) = ft.toByte
      var k = 0
      while (k < stride) {
        cur(k) = Math.floorMod(id * 31 + (y.toLong * stride + k) * 7, 256L).toInt
        k += 1
      }
      k = 0
      while (k < stride) {
        val a = if (k >= 3) cur(k - 3) else 0
        val b = prev(k)
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, if (k >= 3) prev(k - 3) else 0)
        }
        raw(base + 1 + k) = ((cur(k) - pred) & 0xff).toByte
        k += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val out = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](raw.length + 64)
      while (!defl.finished()) { val n = defl.deflate(buf); out.write(buf, 0, n) }
    } finally defl.end()
    val idat = out.toByteArray
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val half = idat.length / 2
    pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", idat.take(half)) ++ pngChunk("IDAT", idat.drop(half)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  private val syntheticBlobSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** [[buildSyntheticPng]] over a corpus: one (media_id, bytes) row per
    * input id. Encoding needs zlib, so unlike [[syntheticPpm]] this is a
    * `mapPartitions` generator rather than a pure-expression column — the
    * DECODE side under test has the identical batch shape either way. */
  def syntheticPngs(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticPngs needs an integral id column, got ${idType.simpleString}")
    // spread only when the per-row build+decode work can repay an
    // exchange: at the gate fixtures' 5x6 pixels the blob work is
    // cheaper than the shuffle and the extra stage measurably SLOWED the
    // downstream graph gates ~1.4x (r17 A/B); realistic image sizes are
    // decode-bound and spread like the other media generators
    val ids = df.select(col(idCol).cast("long").as("media_id"))
    val spreadIds = if (w.toLong * h >= 4096) Projections.spread(ids, col("media_id")) else ids
    spreadIds.mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticPng(id, w, h)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- JPEG (via the JDK's ImageIO — a real perceptual codec) ----

  /** [[decodeJpeg]] row shape: dims + band count + band-0 stats with two
    * positional witnesses (top-left and bottom-right). */
  val jpegSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bands", IntegerType, nullable = false),
    StructField("mean_b0", DoubleType, nullable = false),
    StructField("tl_b0", IntegerType, nullable = false),
    StructField("br_b0", IntegerType, nullable = false)))

  /** Decode a JPEG via `javax.imageio` (public JDK, no external libraries):
    * SOI-magic check, full entropy decode, then band-0 statistics read from
    * the RASTER — `getRGB` would push grayscale through a gray→sRGB color
    * transform and destroy the values under test. Returns
    * (width, height, n_bands, mean_b0, tl_b0, br_b0); None on anything
    * ImageIO rejects or non-JPEG magic.
    *
    * JPEG is lossy in general, so exactness claims live with the SYNTHETIC
    * side ([[buildSyntheticJpeg]]): grayscale + quality 1.0 + per-8×8-block
    * constant values make the DCT round-trip bit-exact (DC-only blocks,
    * all-ones quant tables), which is what lets the oracle recompute the
    * decoded stats from the generation formula. */
  // ImageIO's default stream cache spools a TEMP FILE per decode — at
  // thousands of small frames per partition that file churn dominates the
  // actual entropy decode. Memory-cached streams only, set once per JVM.
  javax.imageio.ImageIO.setUseCache(false)

  // One reusable JPEG reader per executor thread: ImageIO.read() re-runs
  // SPI plugin discovery and allocates a fresh reader on EVERY call, which
  // is pure overhead for the per-frame decodes of the video path. Readers
  // are not thread-safe; thread-locals bound the count by the executor's
  // thread pool.
  private val jpegReaderTl = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
  }

  /** Decode JPEG bytes through the per-thread cached reader; None on
    * anything the reader rejects. */
  private def readJpegImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val reader = jpegReaderTl.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        Option(reader.read(0))
      } finally iis.close()
    } catch { case _: Exception => None }

  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Int, Double, Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None // SOI magic
    val img = readJpegImage(bytes).getOrElse(return None)
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val raster = img.getRaster
    val nb = raster.getNumBands
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some((w, h, nb, s.toDouble / (w.toLong * h),
      raster.getSample(0, 0, 0), raster.getSample(w - 1, h - 1, 0)))
  }

  /** Decode every `bytes` blob as a JPEG (malformed rows dropped). */
  def decodeJpegs(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeJpeg)
          .map { case (w, h, nb, m, tl, br) => Row(r.getLong(0), w, h, nb, m, tl, br) }
      }
    }(Encoders.row(jpegSchema))

  /** A VALID grayscale JPEG whose decode is ANALYTIC: `(1 << id%3)` ×
    * `(1 << id%2)` 8×8 blocks (so the pixel count is a power of two and
    * the mean divides exactly), block (bx, by) filled with the constant
    * `(id*31 + bx*7 + by*13) % 256`, written at quality 1.0. Constant
    * blocks quantize DC-only against all-ones tables, so ImageIO's decode
    * reproduces every sample bit-exactly (verified empirically) — the
    * same oracle-from-formula strategy as the PNG/BMP/PPM paths, now
    * through a real perceptual codec's write+read cycle. Grayscale is
    * essential: an RGB JPEG would round-trip YCbCr and break exactness. */
  private[graft] def buildSyntheticJpeg(id: Long): Array[Byte] = {
    // floorMod: Scala % is sign-preserving, so a negative id shifted by -1
    // produced Int.MinValue dimensions and a generator crash (r15 review
    // finding; the pixel formulas nearby already use floorMod)
    val bw = 1 << Math.floorMod(id, 3L).toInt
    val bh = 1 << Math.floorMod(id, 2L).toInt
    val w = bw * 8; val h = bh * 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = ((id * 31 + bx * 7 + by * 13) % 256).toInt
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { raster.setSample(bx * 8 + x, by * 8 + y, 0, v); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally wr.dispose()
    bos.toByteArray
  }

  /** [[buildSyntheticJpeg]] over a corpus: one (media_id, bytes) row per
    * input id (a `mapPartitions` generator like [[syntheticPngs]] — the
    * DECODE side under test has the identical batch shape either way). */
  def syntheticJpegs(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticJpegs needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticJpeg(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- MP3 (frame-HEADER walk — container metadata, not audio decode) ----

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 =
    * reserved — both rejected). ISO/IEC 11172-3 §2.4.2.3. */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample-rate table (Hz), index 0..2 (3 = reserved). */
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Walk an MPEG-1 Layer III stream's FRAME HEADERS: sync (11 bits),
    * version/layer pinned to MPEG-1 L3, bitrate/sample-rate indexes table-
    * decoded, frame length `144·bitrate/rate + padding`, frames walked
    * back-to-back to exactly the end of the blob (any violation — bad
    * sync, reserved index, truncated tail — drops the WHOLE blob). This is
    * container METADATA, fully specified by the public header layout; the
    * audio payload stays opaque (the actual MDCT decode remains behind
    * [[decodeStub]]).
    *
    * Returns (n_frames, sample_rate, bitrate_kbps of the FIRST frame,
    * duration_ms): MPEG-1 L3 frames carry 1152 samples, so
    * `duration_ms = n_frames · 1152 · 1000 div rate` (truncating — the
    * oracle's arithmetic). */
  def parseMp3Frames(bytes: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    if (bytes.length < 4) return None
    var o = 0
    // ID3v2 prefix — "ID3" + version(2) + flags(1) + SYNCSAFE size(4),
    // optional 10-byte footer when flag 0x10 is set (id3v2.4 §3.1, public
    // layout). Most real-world MP3s carry one; requiring frame sync at
    // byte 0 silently dropped them all (VERDICT r15 #1). The tag is opaque
    // metadata: skip exactly its declared extent, then the strict frame
    // walk applies unchanged. A non-syncsafe size byte, a declared extent
    // at/past the blob end (truncated or tag-only blob), or no frames
    // after the tag all reject the blob as before — no error channel
    // needed, the walk's Option is it.
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if (bytes.length < 10) return None
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None // MSB set: not syncsafe
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val total = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      if (total + 4 > bytes.length) return None
      o = total
    }
    var nFrames = 0L
    var rate = -1
    var firstKbps = -1
    while (o + 4 <= bytes.length) {
      if ((bytes(o) & 0xff) != 0xff || (bytes(o + 1) & 0xe0) != 0xe0) return None
      // version (2b) must be MPEG-1 (11), layer (2b) must be III (01)
      if ((bytes(o + 1) & 0x18) != 0x18 || (bytes(o + 1) & 0x06) != 0x02) return None
      val bIdx = (bytes(o + 2) & 0xf0) >>> 4
      val rIdx = (bytes(o + 2) & 0x0c) >>> 2
      if (bIdx < 1 || bIdx > 14 || rIdx > 2) return None
      val padding = (bytes(o + 2) & 0x02) >>> 1
      val r = Mp3Rates(rIdx)
      if (rate < 0) { rate = r; firstKbps = Mp3Bitrates(bIdx) }
      else if (r != rate) return None // rate must be stream-constant
      val frameLen = 144 * Mp3Bitrates(bIdx) * 1000 / r + padding
      if (frameLen <= 4 || o + frameLen > bytes.length) return None
      nFrames += 1
      o += frameLen
    }
    if (o != bytes.length || nFrames == 0) return None
    Some((nFrames, rate, firstKbps, nFrames * 1152L * 1000L / rate))
  }

  /** A VALID MPEG-1 Layer III stream of `3 + id%4` frames at bitrate
    * `Mp3Bitrates(1 + id%14)` kbps / rate `Mp3Rates(id%3)`, padding bit
    * alternating by frame index, payload zeros — every header field
    * analytic in `id` so the oracle recomputes the parsed metadata.
    * EVEN ids additionally carry a leading ID3v2.4 tag of `17 + id%5`
    * payload bytes (the real-world shape — most MP3s are tagged), which
    * the frame walk must skip without changing any parsed field; the
    * oracle SQL is therefore identical for both halves of the corpus. */
  private[graft] def buildSyntheticMp3(id: Long): Array[Byte] = {
    val nf = 3 + (id % 4).toInt
    val bIdx = 1 + (id % 14).toInt
    val rIdx = (id % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) {
      val payload = 17 + (id % 5).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0) // id3v2.4.0
      out.write(0)               // flags: no footer
      out.write((payload >>> 21) & 0x7f); out.write((payload >>> 14) & 0x7f)
      out.write((payload >>> 7) & 0x7f); out.write(payload & 0x7f)
      (0 until payload).foreach(i => out.write((id + i).toInt & 0x7f))
    }
    (0 until nf).foreach { f =>
      val padding = f % 2
      val frameLen = 144 * Mp3Bitrates(bIdx) * 1000 / Mp3Rates(rIdx) + padding
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
      frame(2) = ((bIdx << 4) | (rIdx << 2) | (padding << 1)).toByte
      frame(3) = 0x00 // stereo, no flags
      out.write(frame)
    }
    out.toByteArray
  }

  /** [[parseMp3Frames]] row shape. */
  val mp3Schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** [[buildSyntheticMp3]] over a corpus ([[syntheticJpegs]] shape). */
  def syntheticMp3s(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticMp3s needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticMp3(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  /** Frame-header metadata of every MP3 blob (malformed rows dropped). */
  def mp3Metadata(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, parseMp3Frames).map { case (nf, rate, kbps, durMs) =>
          Row(r.getLong(0), nf, rate, kbps, durMs)
        }
      }
    }(Encoders.row(mp3Schema))

  // ---- GIF (via the JDK's ImageIO — LZW over a ≤256-color palette) ----

  /** Decode a GIF via `javax.imageio`, returning the RGB pixel array
    * (top-down, 3 ints per pixel — the [[decodePngPixels]] shape, so
    * [[dHash64]] applies unchanged). Magic check `GIF87a`/`GIF89a`; None
    * on anything ImageIO rejects. GIF is LOSSLESS (LZW over palette
    * indices) and `getRGB` on an `IndexColorModel` is a pure palette
    * lookup — no color transform — so decoded values are exact. */
  def decodeGifPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a')
      return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        px(o) = (rgb >> 16) & 0xff
        px(o + 1) = (rgb >> 8) & 0xff
        px(o + 2) = rgb & 0xff
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Decoded GIF summary — the [[decodePng]] stats over the palette-looked-
    * up RGB plane. */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Int)] =
    decodeGifPixels(bytes).map { case (w, h, px) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0
      while (p < px.length) { sr += px(p); sg += px(p + 1); sb += px(p + 2); p += 3 }
      val n = w * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, px(0))
    }

  /** [[decodeGif]] shares the BMP/PNG row shape. */
  val gifSchema: StructType = bmpSchema

  /** Decode every `bytes` blob as a GIF (malformed rows dropped). */
  def decodeGifs(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeGif)
          .map { case (w, h, mr, mg, mb, tl) => Row(r.getLong(0), w, h, mr, mg, mb, tl) }
      }
    }(Encoders.row(gifSchema))

  /** A VALID grayscale GIF whose decode is ANALYTIC: `5 + id%3` ×
    * `6 + id%2` pixels, pixel (x, y) = `(id*37 + x*11 + y*17) % 256` —
    * gray fits any 256-entry palette, LZW is lossless, and the JDK writer
    * preserves gray sample values exactly (unit-verified), so the oracle
    * recomputes the decoded stats from the formula. The same
    * oracle-from-formula strategy as the PNG/BMP/PPM/JPEG paths, through
    * the one JDK-decodable crawl format that was still uncovered. */
  private[graft] def buildSyntheticGif(id: Long): Array[Byte] = {
    val w = 5 + (id % 3).toInt; val h = 6 + (id % 2).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 37 + x * 11 + y * 17) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** [[buildSyntheticGif]] over a corpus: one (media_id, bytes) row per id. */
  def syntheticGifs(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticGifs needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticGif(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- TIFF (hand-built baseline container, decoded by the JDK's ImageIO) ----

  /** Decode a baseline TIFF via `javax.imageio`, returning the RGB pixel
    * array ([[decodePngPixels]] shape — gray samples tripled r=g=b through
    * the RASTER, never `getRGB`, whose gray→sRGB conversion is not
    * identity). Magic check `II*\0` (little-endian) or `MM\0*`
    * (big-endian); None on anything ImageIO rejects. Uncompressed baseline
    * TIFF is LOSSLESS, so decoded samples are exact. */
  def decodeTiffPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val leMagic = bytes.length >= 4 && bytes(0) == 'I' && bytes(1) == 'I' &&
      bytes(2) == 42 && bytes(3) == 0
    val beMagic = bytes.length >= 4 && bytes(0) == 'M' && bytes(1) == 'M' &&
      bytes(2) == 0 && bytes(3) == 42
    if (!leMagic && !beMagic) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val raster = img.getRaster
    val bands = raster.getNumBands
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (bands >= 3) {
          px(o) = raster.getSample(x, y, 0)
          px(o + 1) = raster.getSample(x, y, 1)
          px(o + 2) = raster.getSample(x, y, 2)
        } else {
          val g = raster.getSample(x, y, 0)
          px(o) = g; px(o + 1) = g; px(o + 2) = g
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Decoded TIFF summary — the [[decodePng]] stats shape. */
  def decodeTiff(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Int)] =
    decodeTiffPixels(bytes).map { case (w, h, px) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0
      while (p < px.length) { sr += px(p); sg += px(p + 1); sb += px(p + 2); p += 3 }
      val n = w * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, px(0))
    }

  /** [[decodeTiff]] shares the BMP/PNG/GIF row shape. */
  val tiffSchema: StructType = bmpSchema

  /** Decode every `bytes` blob as a TIFF (malformed rows dropped). */
  def decodeTiffs(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeTiff)
          .map { case (w, h, mr, mg, mb, tl) => Row(r.getLong(0), w, h, mr, mg, mb, tl) }
      }
    }(Encoders.row(tiffSchema))

  /** A VALID little-endian baseline TIFF, serialized BY HAND (header |
    * pixel strip | IFD with the 9 baseline-gray tags in ascending order) —
    * unlike the GIF path, the writer shares no library with the ImageIO
    * READER, so the decode genuinely exercises a foreign byte stream.
    * Canvas `5 + id%3` × `6 + id%2`, pixel (x, y) =
    * `(id*41 + x*13 + y*19) % 256` (grayscale, uncompressed, single
    * strip); the oracle recomputes the decoded stats from the formula. */
  private[graft] def buildSyntheticTiff(id: Long): Array[Byte] = {
    val w = 5 + (id % 3).toInt; val h = 6 + (id % 2).toInt
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = Math.floorMod(id * 41 + x * 13 + y * 19, 256L).toByte
        x += 1
      }
      y += 1
    }
    val nTags = 9
    val ifdOff = 8 + px.length
    val bb = java.nio.ByteBuffer.allocate(ifdOff + 2 + nTags * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    bb.put(px)
    bb.putShort(nTags.toShort)
    def tagShort(tag: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(3).putInt(1).putShort(v.toShort).putShort(0)
    }
    def tagLong(tag: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(4).putInt(1).putInt(v)
    }
    tagShort(256, w) // ImageWidth
    tagShort(257, h) // ImageLength
    tagShort(258, 8) // BitsPerSample
    tagShort(259, 1) // Compression = none
    tagShort(262, 1) // PhotometricInterpretation = BlackIsZero
    tagLong(273, 8) // StripOffsets (pixels sit right after the header)
    tagShort(277, 1) // SamplesPerPixel
    tagShort(278, h) // RowsPerStrip (single strip)
    tagLong(279, px.length) // StripByteCounts
    bb.putInt(0) // next-IFD terminator
    bb.array()
  }

  /** [[buildSyntheticTiff]] over a corpus: one (media_id, bytes) row per id. */
  def syntheticTiffs(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticTiffs needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticTiff(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- WBMP (1-bit wireless bitmap — the last JDK-decodable format) ----

  /** Decode a WBMP (type-0 monochrome) via `javax.imageio`, returning the
    * RGB pixel plane with bits expanded to 0/255 gray triplets (raster
    * samples — a 1-bit image has no color transform to get wrong). Magic
    * check: TypeField 0 + FixHeaderField 0; None on anything ImageIO
    * rejects. */
  def decodeWbmpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 4 || bytes(0) != 0 || bytes(1) != 0) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val raster = img.getRaster
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = raster.getSample(x, y, 0) * 255
        val o = (y * w + x) * 3
        px(o) = g; px(o + 1) = g; px(o + 2) = g
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Decoded WBMP summary — the shared stats row shape. */
  def decodeWbmp(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Int)] =
    decodeWbmpPixels(bytes).map { case (w, h, px) =>
      var s = 0L
      var p = 0
      while (p < px.length) { s += px(p); p += 3 }
      val n = w * h
      val m = s.toDouble / n
      (w, h, m, m, m, px(0))
    }

  val wbmpSchema: StructType = bmpSchema

  /** Decode every `bytes` blob as a WBMP (malformed rows dropped). */
  def decodeWbmps(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeWbmp)
          .map { case (w, h, mr, mg, mb, tl) => Row(r.getLong(0), w, h, mr, mg, mb, tl) }
      }
    }(Encoders.row(wbmpSchema))

  /** A VALID type-0 WBMP serialized BY HAND (TypeField 0, FixHeaderField
    * 0, vbyte dims, MSB-first rows padded to the byte): canvas
    * `5 + id%3` × `6 + id%2`, bit (x, y) = `((id·7 + x·3 + y·5) mod 11)
    * mod 2` — the double mod keeps the pattern aperiodic in both axes so
    * the dHash rows differ. Like the TIFF path, the writer shares no
    * library with ImageIO's reader. */
  private[graft] def buildSyntheticWbmp(id: Long): Array[Byte] = {
    val w = 5 + (id % 3).toInt; val h = 6 + (id % 2).toInt
    require(w < 128 && h < 128) // single-vbyte dims
    val stride = (w + 7) / 8
    val out = new Array[Byte](4 + stride * h)
    out(0) = 0; out(1) = 0; out(2) = w.toByte; out(3) = h.toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bit = (Math.floorMod(id * 7 + x * 3 + y * 5, 11L) % 2).toInt
        if (bit == 1)
          out(4 + y * stride + x / 8) =
            (out(4 + y * stride + x / 8) | (0x80 >> (x % 8))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[buildSyntheticWbmp]] over a corpus. */
  def syntheticWbmps(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticWbmps needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticWbmp(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- AVI / MJPEG (a real video container over a real codec) ----

  /** [[decodeAviMjpeg]] row shape: one row per frame, with the container's
    * frame count and per-frame band-0 stats (the [[decodeJpeg]] shape). */
  val aviSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_b0", DoubleType, nullable = false),
    StructField("tl_b0", IntegerType, nullable = false)))

  /** Parse an AVI (RIFF) container carrying an MJPEG video stream and
    * decode every frame through [[decodeJpeg]] — real video decode, built
    * from the JDK only: the container walk is a strict RIFF chunk scan
    * (the [[decodeWavPcm16]] discipline: long-arithmetic cursors, every
    * malformed shape → None for the WHOLE blob), the per-frame codec is
    * ImageIO. Requires: `RIFF…AVI ` magic, a `LIST hdrl` whose `avih`
    * declares plausible dims and a frame count matching the `movi` chunk
    * count exactly, a `vids`/`MJPG` stream header, and every `00dc` frame
    * decoding to the declared dimensions. H.264/H.265 remain out of scope
    * (patent-encumbered codecs with no JDK decoder) — MJPEG is the
    * container-parsing + frame-pipeline shape at full fidelity.
    *
    * Returns (nFrames, frames = Seq(width, height, mean, topLeft)). */
  def parseAviMjpeg(bytes: Array[Byte]): Option[(Int, Seq[(Int, Int, Double, Int)])] =
    parseAviFrames(bytes).flatMap { case (declW, declH, fs) =>
      val decoded = fs.map(decodeJpeg)
      // strict whole-blob drop: every frame must decode AND match the
      // container's declared dimensions
      if (decoded.exists(d => d.isEmpty ||
        d.exists { case (w, h, _, _, _, _) => w != declW || h != declH })) None
      else Some((fs.size, decoded.map(_.get).map { case (w, h, _, m, tl, _) => (w, h, m, tl) }))
    }

  /** The container half of [[parseAviMjpeg]]: the strict RIFF/AVI walk,
    * returning the declared dimensions and the raw bytes of every `00dc`
    * frame (frame count already cross-checked against `avih`). Callers
    * choose the per-frame decode (stats, pixels, hashes). */
  def parseAviFrames(bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var declFrames = -1; var declW = -1; var declH = -1
    var sawMjpg = false
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    // one flat walk over the outer chunks plus the LISTs we care about —
    // nesting in AVI is fixed (hdrl holds avih+strl, movi holds frames)
    def walk(from: Long, to: Long, depth: Int): Boolean = { // false = malformed
      var o = from
      while (o + 8 <= to) {
        val oi = o.toInt
        val id = tag(oi); val sz = u32(oi + 4)
        val payload = o + 8
        if (payload + sz > to) return false
        id match {
          case "LIST" =>
            if (sz < 4 || depth >= 3) return false
            val listType = tag(payload.toInt)
            // descend into the structural lists; skip unknown ones whole
            if (listType == "hdrl" || listType == "movi" || listType == "strl") {
              if (!walk(payload + 4, payload + sz, depth + 1)) return false
            }
          case "avih" =>
            if (sz < 56) return false
            val p = payload.toInt
            declFrames = u32(p + 16).toInt
            declW = u32(p + 32).toInt; declH = u32(p + 36).toInt
            // plausibility caps BEFORE any frame decode: a crafted header
            // must not buy giant allocations downstream
            if (declFrames < 0 || declFrames > 4096 ||
              declW <= 0 || declH <= 0 || declW > (1 << 14) || declH > (1 << 14))
              return false
          case "strh" =>
            if (sz < 8) return false
            val p = payload.toInt
            if (tag(p) == "vids") {
              if (tag(p + 4) != "MJPG") return false // only codec we decode
              sawMjpg = true
            }
          case "00dc" | "00db" =>
            nFrames += 1
            if (nFrames > 4096) return false
            frames += java.util.Arrays.copyOfRange(bytes, payload.toInt, (payload + sz).toInt)
          case _ => () // strf, idx1, JUNK, … — skipped whole
        }
        o = payload + sz + (sz & 1L) // word-aligned; strictly advances ≥ 8
      }
      o == to || to - o < 8 // trailing sub-8-byte slack only
    }
    if (!walk(12L, math.min(bytes.length.toLong, 8L + u32(4)), 0)) return None
    if (!sawMjpg || declFrames < 0 || nFrames != declFrames) return None
    Some((declW, declH, frames.result()))
  }

  /** Band-0 pixels of a JPEG (the grayscale plane for the MJPEG frames):
    * (width, height, samples row-major). Same guards as [[decodeJpeg]]. */
  def decodeJpegPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    val img = readJpegImage(bytes).getOrElse(return None)
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some((w, h, px))
  }

  /** [[dHash64]] over a single-channel (grayscale) pixel plane. */
  def dHash64Gray(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    def gray(gx: Int, gy: Int): Int = px((gy * h / 8) * w + (gx * w / 9))
    var lo = 0L; var hi = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gx, gy) > gray(gx + 1, gy)) {
          val j = gy * 8 + gx
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (hi, lo)
  }

  /** [[videoFrameDHashes]] row shape. */
  val videoDhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("hash_hi", LongType, nullable = false),
    StructField("hash_lo", LongType, nullable = false),
    StructField("frame_key", LongType, nullable = false)))

  /** Perceptual fingerprint of every MJPEG-AVI frame: container walk →
    * per-frame JPEG decode → grayscale dHash — the video analog of
    * [[imageDHashes]] (frame hashes are what video near-dup, scene cuts,
    * and content matching key on). Same strict whole-blob drop as
    * [[decodeAviMjpeg]]: any undecodable or dimension-mismatched frame
    * drops the container. */
  def videoFrameDHashes(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, parseAviFrames).toSeq.flatMap { case (dw, dh, fs) =>
          val decoded = fs.map(decodeJpegPixels)
          if (decoded.exists(d => d.isEmpty ||
            d.exists { case (w, h, _) => w != dw || h != dh })) Seq.empty
          else decoded.map(_.get).zipWithIndex.map { case ((w, h, px), i) =>
            val (hhi, hlo) = dHash64Gray(w, h, px)
            // exact content key: md5 of (w, h) PLUS the row-major pixel
            // list — the discriminative sibling of the PERCEPTUAL dHash
            // (64-bit dHashes of near-featureless frames collide; the
            // content key matches only pixel-identical frames). The dims
            // prefix keeps a 640×480 and a 480×640 with the same flat
            // pixel stream from colliding as "identical" (VERDICT r15 #2).
            val key = graft.pipeline.Hashing.md5LongJvm(
              s"${w}x$h:" + px.mkString(","))
            Row(r.getLong(0), i.toLong, fs.size, w, h, hhi, hlo, key)
          }
        }
      }
    }(Encoders.row(videoDhashSchema))

  /** [[imageContentKeys]] row shape. */
  val imageKeySchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("img_key", LongType, nullable = false)))

  /** Exact content key per JPEG image blob: the SAME md5-over-(dims +
    * gray-pixels) key as [[videoFrameDHashes]]' `frame_key`, so images and
    * video frames share one content-key space — the cross-media join key.
    * Dims are part of the key (VERDICT r15 #2): transposed-dimension
    * pixel-identical blobs are different content. */
  def imageContentKeys(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, decodeJpegPixels).map { case (w, h, px) =>
          Row(r.getLong(0), w, h,
            graft.pipeline.Hashing.md5LongJvm(s"${w}x$h:" + px.mkString(",")))
        }
      }
    }(Encoders.row(imageKeySchema))

  /** Cross-media exact dedup: which standalone images appear
    * PIXEL-IDENTICALLY as frames inside videos — "is this picture a still
    * from footage we already hold". Both sides reduce to 64-bit content
    * keys map-side (decode never crosses the shuffle), and the match is a
    * key equi-join whose cost is ∝ collisions, never images × frames.
    * Output: `image_id | video_id | frame_idx`. */
  def crossMediaDups(images: DataFrame, videos: DataFrame): DataFrame =
    // shuffle-hash pin: both sides are stat-less typed decode pipelines,
    // and Spark's fallback would BROADCAST the corpus-sized frame-key
    // table (the matchAudioFingerprints/nearDupImages analysis; r15
    // review finding — this join had no pin)
    imageContentKeys(images)
      .select(col("media_id").as("image_id"), col("img_key"))
      .hint("shuffle_hash")
      .join(videoFrameDHashes(videos)
          .select(col("media_id").as("video_id"), col("frame_idx"), col("frame_key")),
        col("img_key") === col("frame_key"))
      .select(col("image_id"), col("video_id"), col("frame_idx"))

  /** Decode every `bytes` blob as an MJPEG AVI: one row per frame
    * (malformed blobs dropped WHOLE — a container with any bad frame
    * contributes nothing). */
  def decodeAviMjpeg(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, parseAviMjpeg).toSeq.flatMap { case (n, fs) =>
          fs.zipWithIndex.map { case ((w, h, m, tl), i) =>
            Row(r.getLong(0), i.toLong, n, w, h, m, tl)
          }
        }
      }
    }(Encoders.row(aviSchema))

  /** A VALID MJPEG AVI per id whose decode is ANALYTIC: `2 + id%3` frames,
    * frame f being [[buildSyntheticJpeg]]`(id + 6·f)` — the +6 stride keeps
    * every frame's block grid (and so the video dimensions) constant within
    * one container while the per-block values advance per frame, all still
    * on the generation formula. Container: RIFF/AVI with `hdrl` (avih +
    * one `vids`/`MJPG` strl), `movi` of `00dc` frames, word-aligned. */
  private[graft] def buildSyntheticAvi(id: Long): Array[Byte] = {
    val nf = 2 + Math.floorMod(id, 3L).toInt
    val frames = (0 until nf).map(f => buildSyntheticJpeg(id + 6L * f))
    val w = 8 * (1 << Math.floorMod(id, 3L).toInt)
    val h = 8 * (1 << Math.floorMod(id, 2L).toInt)
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id4.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(type4: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", type4.getBytes("US-ASCII") ++ body)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(33333).putInt(0).putInt(0).putInt(0) // usec/frame, bps, pad, flags
      bb.putInt(nf).putInt(0).putInt(1).putInt(0) //    frames, initial, streams, bufsz
      bb.putInt(w).putInt(h)
      bb.array() // trailing reserved dwords stay zero
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      bb.putInt(0).putInt(0).putInt(0) //          flags, prio+lang, initial
      bb.putInt(1).putInt(30).putInt(0).putInt(nf) // scale, rate, start, length
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      bb.put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    bb.array()
  }

  /** The [[syntheticWalshWav]] sample formula on the JVM side (the AV
    * container is byte-assembled in the builder, not as a Column). */
  private[graft] def walshSample(id: Long, t: Long): Short = {
    val g = t / 64; val j = t % 64
    val k = 1L + Math.floorMod(
      id * 5 + Math.floorMod(g * 2, 5L) * (7 + Math.floorMod(id, 11L)), 63L)
    (if (java.lang.Long.bitCount(j & k) % 2 == 0) 1000 else -1000).toShort
  }

  /** A VALID two-stream AVI: the [[buildSyntheticAvi]] MJPEG video PLUS a
    * PCM16 mono SOUNDTRACK — an `auds` stream header, a WAVEFORMATEX
    * `strf`, and the audio payload split across two interleaved `01wb`
    * chunks (multi-chunk concatenation is how real muxers interleave).
    * The soundtrack is the Walsh-tone stream of `audioId` trimmed to
    * global samples 64..255 (3 frames), i.e. a one-frame-shifted copy of
    * [[syntheticWalshWav]]`(audioId, 320)` — so a video's soundtrack is
    * MATCHABLE against a standalone audio corpus by fingerprint, the
    * cross-media "does this footage carry known audio" shape. */
  private[graft] def buildSyntheticAviAV(id: Long, audioId: Long): Array[Byte] = {
    val nf = 2 + (id % 3).toInt
    val frames = (0 until nf).map(f => buildSyntheticJpeg(id + 6L * f))
    val w = 8 * (1 << (id % 3).toInt); val h = 8 * (1 << (id % 2).toInt)
    val nSamples = 192
    val audio = Array.tabulate(nSamples)(i => walshSample(audioId, 64L + i))
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id4.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(type4: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", type4.getBytes("US-ASCII") ++ body)
    def pcmBytes(s: Array[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(s.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      s.foreach(bb.putShort)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(33333).putInt(0).putInt(0).putInt(0)
      bb.putInt(nf).putInt(0).putInt(2).putInt(0) // TWO streams
      bb.putInt(w).putInt(h)
      bb.array()
    }
    val strhV = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(1).putInt(30).putInt(0).putInt(nf)
      bb.array()
    }
    val strfV = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      bb.put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
      bb.array()
    }
    val strhA = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("auds".getBytes("US-ASCII")).putInt(1) // fccHandler 1 = PCM
      bb.putInt(0).putInt(0).putInt(0) //              flags, prio+lang, initial
      bb.putInt(1).putInt(16000).putInt(0).putInt(nSamples) // scale, rate, start, length
      bb.array()
    }
    val strfA = { // WAVEFORMATEX (PCM16 mono @16 kHz)
      val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strhV) ++ chunk("strf", strfV)) ++
      list("strl", chunk("strh", strhA) ++ chunk("strf", strfA)))
    // interleave: audio split across two 01wb chunks between video frames
    val (a1, a2) = audio.splitAt(nSamples / 2)
    val moviBody = chunk("00dc", frames.head) ++ chunk("01wb", pcmBytes(a1)) ++
      frames.tail.flatMap(f => chunk("00dc", f)) ++ chunk("01wb", pcmBytes(a2))
    val movi = list("movi", moviBody)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    bb.array()
  }

  /** [[buildSyntheticAviAV]] over a corpus: media_id = idCol, soundtrack
    * content = audioIdCol. */
  def syntheticAvisAV(df: DataFrame, idCol: String, audioIdCol: String): DataFrame = {
    val ok = Seq(ByteType, ShortType, IntegerType, LongType)
    require(ok.contains(df.schema(idCol).dataType) &&
      ok.contains(df.schema(audioIdCol).dataType),
      s"syntheticAvisAV needs integral id columns")
    Projections.spread(df, col(idCol)).select(col(idCol).cast("long").as("media_id"),
        col(audioIdCol).cast("long").as("_aid"))
      .mapPartitions { it =>
        it.map { r => Row(r.getLong(0), buildSyntheticAviAV(r.getLong(0), r.getLong(1))) }
      }(Encoders.row(syntheticBlobSchema))
  }

  /** Extract the PCM16 soundtrack of an AVI: the strict [[parseAviFrames]]
    * walk extended to the audio stream — requires an `auds` stream header
    * whose declared sample length matches the concatenated `01wb`
    * payloads exactly, and a PCM16-mono WAVEFORMATEX `strf`. Returns
    * (sampleRate, samples); None on any malformed shape (whole-blob
    * drop). Chunks concatenate in movi order — the interleaving a muxer
    * writes is storage layout, not timeline. */
  def parseAviAudioPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var declSamples = -1L; var rate = -1
    var inAudioStrl = false; var sawPcmFmt = false
    val audio = new java.io.ByteArrayOutputStream()
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var o = from
      while (o + 8 <= to) {
        val oi = o.toInt
        val id = tag(oi); val sz = u32(oi + 4)
        val payload = o + 8
        if (payload + sz > to) return false
        id match {
          case "LIST" =>
            if (sz < 4 || depth >= 3) return false
            val listType = tag(payload.toInt)
            if (listType == "strl") inAudioStrl = false // reset per stream
            if (listType == "hdrl" || listType == "movi" || listType == "strl") {
              if (!walk(payload + 4, payload + sz, depth + 1)) return false
            }
          case "strh" =>
            if (sz < 40) return false
            val p = payload.toInt
            if (tag(p) == "auds") {
              inAudioStrl = true
              declSamples = u32(p + 32) // dwLength
              if (declSamples < 0 || declSamples > (1L << 26)) return false
            }
          case "strf" if inAudioStrl =>
            if (sz < 16) return false
            val p = payload.toInt
            if (u16(p) != 1 || u16(p + 2) != 1 || u16(p + 14) != 16) return false
            rate = u32(p + 4).toInt
            sawPcmFmt = true
          case "01wb" =>
            audio.write(bytes, payload.toInt, sz.toInt)
          case _ => ()
        }
        o = payload + sz + (sz & 1L)
      }
      o == to || to - o < 8
    }
    if (!walk(12L, math.min(bytes.length.toLong, 8L + u32(4)), 0)) return None
    if (!sawPcmFmt || rate <= 0 || declSamples < 0) return None
    val raw = audio.toByteArray
    if (raw.length != declSamples * 2) return None // length cross-check
    val smp = new Array[Short](raw.length / 2)
    var i = 0
    while (i < smp.length) {
      smp(i) = ((raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some((rate, smp))
  }

  /** Blob-local landmark fingerprints of every AVI's SOUNDTRACK (malformed
    * containers dropped whole) — the [[audioLocalFingerprints]] shape, so
    * the output joins [[matchAudioFingerprints]] / the streaming admission
    * directly: "does this footage carry audio we already index". */
  def videoSoundtrackFingerprints(media: DataFrame, frameSize: Int = 64,
      maxDelta: Int = 2): DataFrame = {
    require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a positive power of two, got $frameSize")
    require(maxDelta >= 1 && maxDelta < 64, s"maxDelta must be in [1, 64), got $maxDelta")
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, (b: Array[Byte]) => parseAviAudioPcm16(b).map { case (_, smp) =>
          localFpsOfPeaks(whtPeaksOfSamples(smp, frameSize).map(_._2).toIndexedSeq, maxDelta)
        }).toSeq.flatten.map { case (f, key) => Row(r.getLong(0), f, key) }
      }
    }(Encoders.row(localFpSchema))
  }

  /** [[buildSyntheticAvi]] over a corpus ([[syntheticJpegs]] shape). */
  def syntheticAvis(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticAvis needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticAvi(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  // ---- WARC (the CommonCrawl container) ----

  /** [[parseWarc]] row shape: one row per WARC record. */
  val warcSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  /** 256 MiB decompression ceiling: every other decoder here caps crafted
    * expansion (PNG 64 MiB, AVI declared-sample caps); an unbounded
    * readAllBytes on a gzip BOMB allocates the full expansion and the
    * resulting OutOfMemoryError is fatal — NOT caught by decodeRow's
    * NonFatal Try — killing the executor (r15 review finding). Over the
    * cap the blob is malformed-by-policy and drops whole, like any other
    * container violation. */
  private val MaxGunzipBytes = 256 * 1024 * 1024

  private def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    scala.util.Try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          require(out.size() <= MaxGunzipBytes,
            s"gzip expansion exceeds $MaxGunzipBytes bytes")
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    }.toOption

  /** Parse a WARC/1.0 blob (plain or gzipped — CommonCrawl ships .warc.gz)
    * into its records: `(rec_idx, warc_type, target_uri, content_length,
    * n_tokens)` with `n_tokens` the whitespace token count of the payload.
    * Strict per the spec's framing: version line, CRLF headers, exact
    * Content-Length payload, CRLF CRLF trailer; any violation (or a bad
    * gzip stream) drops the WHOLE blob — a half-parsed container must not
    * contribute partial records.
    *
    * Reference analog: the ingest surface (`src/engine/core/read/flow/`) —
    * the reference has no container format; WARC is the training-pipeline
    * entry point this library adds. */
  private[graft] def parseWarcBytes(
      raw: Array[Byte]): Option[Vector[(Long, String, String, Long, String)]] = {
    val data =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzip(raw).getOrElse(return None)
      else raw
    def line(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < data.length && !(data(i) == '\r' && data(i + 1) == '\n')) i += 1
      if (i + 1 >= data.length) None
      else Some((new String(data, from, i - from, "ISO-8859-1"), i + 2))
    }
    val out = Vector.newBuilder[(Long, String, String, Long, String)]
    var pos = 0
    var idx = 0L
    while (pos < data.length) {
      val (ver, p0) = line(pos).getOrElse(return None)
      if (ver != "WARC/1.0") return None
      var p = p0
      var typ: String = null
      var uri: String = null
      var clen = -1L
      var blank = false
      while (!blank) {
        val (l, pn) = line(p).getOrElse(return None)
        p = pn
        if (l.isEmpty) blank = true
        else {
          val cut = l.indexOf(':')
          if (cut < 0) return None
          val (k, v) = (l.substring(0, cut).trim.toLowerCase, l.substring(cut + 1).trim)
          k match {
            case "warc-type"       => typ = v
            case "warc-target-uri" => uri = v
            case "content-length"  => clen = v.toLongOption.getOrElse(return None)
            case _                 => () // unknown headers pass through
          }
        }
      }
      if (clen < 0 || p + clen + 4 > data.length) return None
      val payload = new String(data, p, clen.toInt, "ISO-8859-1")
      p += clen.toInt
      if (!(data(p) == '\r' && data(p + 1) == '\n' &&
            data(p + 2) == '\r' && data(p + 3) == '\n')) return None
      p += 4
      out += ((idx, typ, uri, clen, payload))
      idx += 1
      pos = p
    }
    Some(out.result())
  }

  /** Explode every `bytes` blob as a WARC container (malformed blobs
    * dropped whole). One row per record, [[warcSchema]]. */
  def parseWarc(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, parseWarcBytes).toSeq.flatten.map {
          case (i, t, u, cl, payload) =>
            val trimmed = payload.trim
            val nTok = if (trimmed.isEmpty) 0L else trimmed.split("\\s+").length.toLong
            Row(r.getLong(0), i, t, u, cl, nTok)
        }
      }
    }(Encoders.row(warcSchema))

  /** [[parseWarcPayloads]] row shape: the record PAYLOAD itself — the
    * ingest path's real output (feed it `TextAnalysis.htmlToText` and the
    * curation chain). */
  val warcPayloadSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("payload", StringType, nullable = false)))

  def parseWarcPayloads(media: DataFrame): DataFrame =
    idAndBytes(media).mapPartitions { it =>
      it.flatMap { r =>
        decodeRow(r, parseWarcBytes).toSeq.flatten.map {
          case (i, t, u, _, payload) => Row(r.getLong(0), i, t, u, payload)
        }
      }
    }(Encoders.row(warcPayloadSchema))

  /** A VALID synthetic WARC per id: `2 + id%3` records, record k typed
    * response/request by parity with target URI
    * `http://example.com/<id>/<k>` and a payload of `5 + (id+k)%4` tokens
    * `tok<(id*31 + k*7 + t*13) % 100>` — every output field of
    * [[parseWarc]] is an analytic function of (id, k), so the oracle
    * verifies the PARSER without parsing anything. Odd ids gzip the whole
    * container (the .warc.gz path); gzip encoding details never reach the
    * output, so determinism needs only round-trip fidelity. */
  private[graft] def buildSyntheticWarc(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val nRecs = (2 + id % 3).toInt
    for (k <- 0 until nRecs) {
      val nTok = (5 + (id + k) % 4).toInt
      val payload = (0 until nTok)
        .map(t => "tok" + ((id * 31 + k * 7 + t * 13) % 100)).mkString(" ")
      val pb = payload.getBytes("US-ASCII")
      val typ = if (k % 2 == 0) "response" else "request"
      val hdr = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
        s"WARC-Target-URI: http://example.com/$id/$k\r\n" +
        s"Content-Length: ${pb.length}\r\n\r\n"
      bos.write(hdr.getBytes("US-ASCII"))
      bos.write(pb)
      bos.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    val plain = bos.toByteArray
    if (id % 2 == 1) {
      val gz = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(gz)
      out.write(plain); out.close()
      gz.toByteArray
    } else plain
  }

  /** A one-record WARC per row whose payload is the document's text
    * wrapped as an HTML page — the realistic crawl layout for the
    * bytes → records → [[TextAnalysis.htmlToText]] → curation composition.
    * Odd ids gzip the container like [[buildSyntheticWarc]]. */
  def syntheticHtmlWarcs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticHtmlWarcs needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df, col(idCol))
      .select(col(idCol).cast("long").as("media_id"), col(textCol).as("t"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val html = s"<html><head><title>D$id</title></head><body><p>" +
            Option(r.getString(1)).getOrElse("") + "</p></body></html>"
          val pb = html.getBytes("US-ASCII")
          val hdr = s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: http://example.com/$id\r\n" +
            s"Content-Length: ${pb.length}\r\n\r\n"
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(hdr.getBytes("US-ASCII")); bos.write(pb)
          bos.write("\r\n\r\n".getBytes("US-ASCII"))
          val plain = bos.toByteArray
          val blob = if (id % 2 == 1) {
            val gz = new java.io.ByteArrayOutputStream()
            val out = new java.util.zip.GZIPOutputStream(gz)
            out.write(plain); out.close()
            gz.toByteArray
          } else plain
          Row(id, blob)
        }
      }(Encoders.row(syntheticBlobSchema))
  }

  def syntheticWarcs(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"syntheticWarcs needs an integral id column, got ${idType.simpleString}")
    Projections.spread(df.select(col(idCol).cast("long").as("media_id")),
        col("media_id")).mapPartitions { it =>
      it.map { r => val id = r.getLong(0); Row(id, buildSyntheticWarc(id)) }
    }(Encoders.row(syntheticBlobSchema))
  }

  /** Batch-shaped extraction harness for a REAL decoder: one codec init per
    * partition, rows streamed — the `mapInPandas` analog. A production
    * image/audio decoder replaces `decode` (the default wires in the stub,
    * which keeps this path exercised and output-identical to
    * [[extractFeatures]]). */
  def extractFeaturesWithDecoder(media: DataFrame,
      decode: Array[Byte] => Array[Double] = decodeStub): DataFrame = {
    // widen the id at plan time (the idAndBytes contract): a raw
    // getLong(0) on an IntegerType media_id threw ClassCastException
    // per row executor-side (r15 review finding)
    media.select(col("media_id").cast("long").as("media_id"),
        col("kind"), col("bytes"))
      .mapPartitions { it =>
        // per-partition setup: a real implementation initializes the codec
        // once here before streaming the rows through it
        it.map { r =>
          // null blob → empty-input features, same as a zero-length blob
          val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), r.getString(1), decode(bytes).toSeq)
        }
      }(Encoders.row(featureSchema))
  }
}
