package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata.
  *
  * Decode kernels come in two tiers:
  *   - REAL pure-JVM decoders for uncompressed container formats — WAV
  *     (RIFF/PCM, 8- and 16-bit), BMP (BITMAPINFOHEADER, uncompressed
  *     24/32-bit), and PPM (P6) — no codec library needed; MultimodalSpec
  *     pins them to checked-in binary fixtures sample-for-sample /
  *     pixel-for-pixel.
  *   - a clearly-labeled deterministic STUB for compressed formats
  *     (JPEG/PNG/MP4…, whose codecs are not in this environment). The
  *     Spark-side plumbing — schema, batching, partition-wise processing,
  *     output shape — is identical for both tiers and is the part that
  *     matters at 100 TB.
  */
object MultimodalOps {

  val featureDim = 8

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    // exact integer content checksum from the SAME decode pass — wav:
    // Σ round(|sample|·32768) (integer-exact for 8/16-bit PCM), images:
    // Σ (r+g+b) over pixels, other formats: byte length. Certifies the
    // decoder read every sample/pixel; q_media_decode's oracle replays it
    StructField("content_sum", LongType, nullable = false)))

  /** STUB decode kernel for COMPRESSED formats: a real deployment would
    * decode image/audio bytes here (e.g. JPEG → RGB tensor). The
    * deterministic fake derives a feature vector from the payload bytes so
    * the pipeline shape is testable. */
  private def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  // ---- real decoders (uncompressed formats) --------------------------------

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  final case class WavData(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Float])

  /** REAL WAV decoder: RIFF/WAVE chunk walk, PCM (format tag 1) at 8 or 16
    * bits. Samples are normalized to [-1, 1] (16-bit: v/32768; 8-bit
    * unsigned: (v-128)/128), channels left interleaved. Throws
    * IllegalArgumentException on malformed/unsupported payloads. */
  def decodeWav(bytes: Array[Byte]): WavData = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE payload")
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var data: Array[Byte] = null
    var o = 12
    while (o + 8 <= bytes.length && (fmtTag < 0 || data == null)) {
      val id = new String(bytes, o, 4, "US-ASCII")
      val sz = le32(bytes, o + 4)
      require(sz >= 0 && o + 8 + sz <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(sz >= 16, "fmt chunk too short")
          fmtTag = le16(bytes, o + 8)
          channels = le16(bytes, o + 10)
          rate = le32(bytes, o + 12)
          bits = le16(bytes, o + 22)
        case "data" => data = java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + sz)
        case _ => ()
      }
      o += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(fmtTag == 1, s"unsupported WAV format tag $fmtTag (PCM only)")
    require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
    require(channels >= 1 && data != null, "missing fmt/data chunk")
    val samples =
      if (bits == 16) Array.tabulate(data.length / 2)(i =>
        le16(data, i * 2).toShort / 32768.0f)
      else Array.tabulate(data.length)(i => ((data(i) & 0xff) - 128) / 128.0f)
    WavData(rate, channels, bits, samples)
  }

  final case class ImageData(width: Int, height: Int, pixels: Array[Int]) {
    // pixels are packed 0xRRGGBB, row-major, top-down
    def lum(i: Int): Float = {
      val p = pixels(i)
      (0.299f * ((p >> 16) & 0xff) + 0.587f * ((p >> 8) & 0xff) +
        0.114f * (p & 0xff)) / 255.0f
    }
  }

  /** REAL BMP decoder: BITMAPINFOHEADER (or larger), BI_RGB uncompressed,
    * 24/32-bit. Handles bottom-up (positive height) and top-down rows and
    * 4-byte row padding; returns top-down packed-RGB pixels. */
  def decodeBmp(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val pixOff = le32(bytes, 10)
    val dibSize = le32(bytes, 14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(compression == 0, s"unsupported BMP compression $compression")
    require(bpp == 24 || bpp == 32, s"unsupported BMP bpp $bpp")
    require(w > 0 && hRaw != 0, "degenerate BMP dimensions")
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bytesPerPx = bpp / 8
    val stride = ((w * bytesPerPx) + 3) / 4 * 4
    require(pixOff + stride.toLong * h <= bytes.length, "truncated BMP pixel data")
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = pixOff + srcRow * stride
      var x = 0
      while (x < w) {
        val p = base + x * bytesPerPx
        out(row * w + x) = ((bytes(p + 2) & 0xff) << 16) |
          ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
        x += 1
      }
      row += 1
    }
    ImageData(w, h, out)
  }

  /** REAL PPM (P6, binary) decoder: ASCII header (with `#` comments), then
    * raw RGB triplets; maxval ≤ 255. */
  def decodePpm(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var o = 2
    def nextInt(): Int = {
      // skip whitespace and comment lines
      var inComment = false
      while (o < bytes.length && {
        val c = bytes(o).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) o += 1
      var v = 0; var any = false
      while (o < bytes.length && bytes(o).toChar.isDigit) {
        v = v * 10 + (bytes(o) - '0'); o += 1; any = true
      }
      require(any, "malformed PPM header")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv > 0 && maxv <= 255, s"unsupported PPM maxval $maxv")
    o += 1 // single whitespace after maxval
    require(o + 3L * w * h <= bytes.length, "truncated PPM pixel data")
    val out = Array.tabulate(w * h) { i =>
      val p = o + i * 3
      ((bytes(p) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
    }
    ImageData(w, h, out)
  }

  /** Mean of each of `featureDim` contiguous bins over a value sequence —
    * the shared feature shape for both audio (amplitude envelope) and
    * image (luminance profile) kernels. Empty input → zero vector. */
  private[ops] def binMeans(values: Array[Float]): Array[Float] = {
    val out = new Array[Float](featureDim)
    val n = values.length
    if (n == 0) return out
    var d = 0
    while (d < featureDim) {
      val start = (d.toLong * n / featureDim).toInt
      val end = ((d + 1).toLong * n / featureDim).toInt
      if (end > start) {
        var s = 0.0; var i = start
        while (i < end) { s += values(i); i += 1 }
        out(d) = (s / (end - start)).toFloat
      }
      d += 1
    }
    out
  }

  /** Feature vector for one payload: REAL decode for wav/bmp/ppm (audio →
    * absolute-amplitude envelope, images → luminance profile, both binned
    * to `featureDim` means), STUB for everything else. A payload whose
    * sniffed format claims a real decoder but fails to parse falls back to
    * the stub — decode errors must not kill a 100 TB batch job. */
  private[ops] def decodeOne(format: String, bytes: Array[Byte]): Array[Float] =
    decodeBoth(format, bytes)._1

  /** One decode pass → (feature vector, exact integer content checksum).
    * The checksum is lossless integer arithmetic on the decoded values
    * (|sample|·32768 is an integer for 8/16-bit PCM; pixel channels are
    * bytes), so it certifies end-to-end decode correctness without any
    * float in the comparison path. */
  private[ops] def decodeBoth(format: String, bytes: Array[Byte]): (Array[Float], Long) =
    try format match {
      case "wav" =>
        val abs = decodeWav(bytes).samples.map(math.abs)
        (binMeans(abs), abs.foldLeft(0L)((a, s) => a + math.round(s * 32768.0)))
      case "bmp" =>
        val img = decodeBmp(bytes)
        (binMeans(Array.tabulate(img.pixels.length)(img.lum)), rgbSum(img.pixels))
      case "ppm" =>
        val img = decodePpm(bytes)
        (binMeans(Array.tabulate(img.pixels.length)(img.lum)), rgbSum(img.pixels))
      case _ => (stubDecode(bytes), bytes.length.toLong)
    // NonFatal, not just IllegalArgumentException: format sniffing is a
    // 2-byte magic check, so a malformed header can drive the real
    // decoders into ArrayIndexOutOfBounds (negative BMP pixel offset) or
    // NegativeArraySize (overflowed PPM dims) — any such payload must fall
    // back to the stub, never kill the task
    } catch { case scala.util.control.NonFatal(_) =>
      (stubDecode(bytes), bytes.length.toLong) }

  private def rgbSum(pixels: Array[Int]): Long =
    pixels.foldLeft(0L)((a, p) =>
      a + ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff))

  /** Partition-wise batch decode over a binary `payload` column — the Scala
    * analog of a `mapInPandas` batch UDF: one kernel invocation per batch,
    * never per row on the driver. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    // Dataset.mapPartitions (not .rdd.mapPartitions): the RDD conversion
    // forces AQE to materialize every exchange below it AT CONSTRUCTION
    // (AdaptiveSparkPlanExec resolves its final plan eagerly for .rdd), so
    // a kernel-floor repartition upstream turned query construction into a
    // corpus-scan job. The typed operator stays a lazy node in ONE plan —
    // no job until the caller executes, and the decode kernel still runs
    // partition-wise off the scan.
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(decodedSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.grouped(256).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val fmt = sniffFormat(bytes)
            val (features, sum) = decodeBoth(fmt, bytes)
            Row(id, bytes.length.toLong, fmt, features, sum)
          }
        }
      }
  }

  /** Magic-byte format sniffing (real logic — works on any binary column).
    * RIFF containers are resolved one level deeper: a `WAVE` form type is
    * "wav" (really decodable); other RIFF forms stay "riff". */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else "unknown"

  /** STUB frame sampler: every-nth-frame extraction from a video payload.
    * The real kernel would demux/decode; the fake treats the payload as
    * fixed-size "frames" of `frameBytes` and emits one row per sampled
    * frame — the explode-shaped plumbing (one input row → N output rows,
    * schema, ordering) is the real part. */
  def sampleFrames(df: DataFrame, everyNth: Int, frameBytes: Int = 256): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    df.select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }

  /** STUB resize: average-pool a feature vector down to `outDim` (the array
    * math is real; a real image resize would pool pixels the same way). */
  def resizeFeatures(df: DataFrame, outDim: Int): DataFrame = {
    val inSize = size(col("features"))
    val pooled = transform(sequence(lit(0), lit(outDim - 1)), i => {
      val start = ((i * inSize) / lit(outDim)).cast("int")
      val end = (((i + lit(1)) * inSize) / lit(outDim)).cast("int")
      val window = slice(col("features"), start + 1, greatest(end - start, lit(1)))
      aggregate(window, lit(0.0d), (acc, x) => acc + x.cast("double"),
        acc => (acc / size(window)).cast("float"))
    })
    df.withColumn("features_resized", pooled)
  }

  /** Binary-column metadata over a synthesized payload (text bytes stand in
    * for media bytes): byte length + md5 digest — oracle-checkable since
    * both engines hash the same UTF-8 bytes. */
  def qBinaryMeta(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "documents")
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"))
      .orderBy("doc_id")

  /** Synthesize a minimal 8-bit PCM mono WAV container around arbitrary
    * payload bytes (here: a document's UTF-8 text) — a DETERMINISTIC way to
    * exercise the REAL RIFF/PCM decode path at any scale without media
    * files in the environment. Pure Column expression (no UDF): the header
    * is a binary concat, LE fields built from the payload length. */
  def wavFromBytes(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = length(payload)
    // Spark has no int→LE-binary builtin; build via hex → unhex of the
    // byte-swapped value (hex is big-endian, so emit its byte pairs in
    // reverse order)
    def le(v: org.apache.spark.sql.Column, bytes: Int): org.apache.spark.sql.Column = {
      val hexed = lpad(hex(v), bytes * 2, "0")
      val chunks = (0 until bytes).map(i =>
        substring(hexed, (bytes - 1 - i) * 2 + 1, 2))
      unhex(concat(chunks: _*))
    }
    concat(
      lit("RIFF").cast("binary"), le(n + 36, 4), lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), le(lit(16), 4),
      le(lit(1), 2), le(lit(1), 2),            // PCM, mono
      le(lit(8000), 4), le(lit(8000), 4),      // rate, byte rate
      le(lit(1), 2), le(lit(8), 2),            // block align, 8-bit
      lit("data").cast("binary"), le(n, 4), payload)
  }

  /** X14b: the real-decoder face over synthesized WAV payloads — every
    * document's text bytes wrapped in a PCM container, decoded by the REAL
    * RIFF parser (not the stub), reduced to metadata + an exact integer
    * content checksum.
    *
    * ORACLE-CHECKED since r12: the 8-bit PCM mapping is sample =
    * (byte − 128)/128, so Σ round(|sample|·32768) = Σ |byte − 128|·256 —
    * pure integer arithmetic on the payload's UTF-8 bytes, which DuckDB
    * replays byte-for-byte (hex-nibble extraction). The hash match
    * certifies the WHOLE path: container synthesis (44-byte header +
    * data), magic-byte sniff routing to the real decoder, RIFF chunk
    * walk, and every decoded sample. The float feature vector stays out
    * of the comparison (bounded-verdict only); MultimodalSpec pins it to
    * fixtures. */
  def qMediaDecode(s: SparkSession, sf: String): DataFrame = {
    val docs = tWide(s, sf, "documents")
      .select(col("doc_id"), wavFromBytes(col("text").cast("binary")).as("payload"))
    decodeFeatures(docs)
      .select(col("doc_id"), col("format"), col("n_bytes"), col("content_sum"),
        (size(filter(col("features"),
          f => f < lit(0.0f) || f > lit(1.0f))) === 0).as("features_bounded"))
      .orderBy("doc_id")
  }
}
