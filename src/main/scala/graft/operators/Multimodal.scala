package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-at-a-time with
  * `mapPartitions` (the Scala analog of a Pandas-UDF `mapInPandas`
  * pipeline — per-partition imperative decode is the one place SURVEY §7
  * sanctions dropping below the DataFrame API).
  *
  * Image decode is REAL: PNG/JPEG/GIF/BMP payloads go through the JDK's
  * built-in `javax.imageio` (no external dependencies) for true pixel
  * dimensions. Audio/video codec work is STUBBED (this container ships no
  * media libraries): `decodeStub` derives deterministic pseudo-metadata
  * from the bytes themselves, so the Spark-side contract — schema, batch
  * iteration, partitioning, output shape — is real and testable, and a
  * production codec drops in by replacing one function.
  *
  * Scale notes: payloads never leave their partition (no shuffle), the
  * decode is streamed row-group by row-group (iterator in, iterator out —
  * no per-partition materialization), and feature extraction emits small
  * fixed-width vectors so downstream joins/ANN shuffle features, not media.
  */
object Multimodal {

  // ImageIO's InputStream path writes a disk cache file per read by
  // default — pure overhead for in-memory byte-array payloads
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    // audio-only metadata (null for non-audio payloads)
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Normalized byte-histogram features — deterministic stand-in for a
    * learned embedding, shared by the real-image and stub paths. */
  private def byteFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val n = payload.length
    val features = new Array[Float](dim)
    var i = 0
    while (i < n) {
      features(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    if (n > 0) { var j = 0; while (j < dim) { features(j) /= n; j += 1 } }
    features
  }

  /** PNG/JPEG magic-byte sniff — cheap pre-check so ImageIO is only
    * invoked on plausible image payloads. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length > 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||                       // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||                        // GIF
      (p(0) == 'B' && p(1) == 'M'))                                         // BMP

  /** REAL image decode via the JDK's built-in ImageIO (PNG/JPEG/GIF/BMP,
    * zero external dependencies): true pixel dimensions, or None when the
    * payload isn't a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || !looksLikeImage(payload)) return None
    val in = new java.io.ByteArrayInputStream(payload)
    try {
      val img = javax.imageio.ImageIO.read(in)
      if (img == null) None else Some((img.getWidth, img.getHeight))
    } catch { case _: Exception => None } finally in.close()
  }

  /** WAV/AIFF/AU magic-byte sniff — javax.sound is only invoked on
    * plausible audio payloads. */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length > 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') || // WAV
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||    // AIFF
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))      // AU

  /** REAL audio metadata decode via the JDK's built-in
    * `javax.sound.sampled` (WAV/AIFF/AU, zero external dependencies):
    * (sampleRate Hz, channels, duration ms), or None when the payload
    * isn't a decodable audio stream. Only compressed codecs (mp3 etc.)
    * remain outside the JDK's reach. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    if (payload == null || !looksLikeAudio(payload)) return None
    val in = new java.io.ByteArrayInputStream(payload)
    try {
      val stream = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
      try {
        val fmt = stream.getFormat
        val frames = stream.getFrameLength
        val rate = fmt.getSampleRate
        val durMs =
          if (frames >= 0 && rate > 0) (frames * 1000.0 / rate).toLong else 0L
        Some((rate.toInt, fmt.getChannels, durMs))
      } finally stream.close()
    } catch { case _: Exception => None } finally in.close()
  }

  /** STUB decode standing in for the remaining codecs (ffmpeg in a
    * Pandas-UDF deployment): metadata is a pure deterministic function of
    * the payload bytes. Video and compressed-audio payloads go through
    * here; images take the real [[decodeImage]] path and WAV/AIFF/AU the
    * real [[decodeAudio]] path. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (if (n > 0) (payload(0) & 0x3F) else 0)
    val height = 1 + (if (n > 1) (payload(1) & 0x3F) else 0)
    val frames = 1 + n / 4096
    (width, height, frames, byteFeatures(payload, dim))
  }

  /** One decoded payload: image/stub dims + frames, audio metadata when
    * the bytes are a decodable audio stream, and the feature vector. */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
    sampleRate: Option[Int], channels: Option[Int], durationMs: Option[Long],
    features: Array[Float])

  /** Decode one payload: real ImageIO dimensions for PNG/JPEG/GIF/BMP,
    * real javax.sound metadata for WAV/AIFF/AU, the deterministic stub
    * otherwise. */
  def decode(payload: Array[Byte], dim: Int = 16): Decoded =
    decodeImage(payload) match {
      case Some((w, h)) =>
        Decoded(w, h, 1, None, None, None, byteFeatures(payload, dim))
      case None => decodeAudio(payload) match {
        case Some((rate, ch, durMs)) =>
          Decoded(0, 0, 1, Some(rate), Some(ch), Some(durMs),
            byteFeatures(payload, dim))
        case None =>
          val (w, h, f, feat) = decodeStub(payload, dim)
          Decoded(w, h, f, None, None, None, feat)
      }
    }

  /** Decode + feature-extract a media DataFrame (columns: media_id,
    * payload, media_type) into `decodedSchema`, batch-at-a-time. */
  def decodeAndFeaturize(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val typeIdx = media.schema.fieldIndex("media_type")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx)
        val d = decode(payload, dim)
        Row(r.getLong(idIdx),
          if (r.isNullAt(typeIdx)) null else r.getString(typeIdx),
          payload.length, d.width, d.height, d.nFrames,
          d.sampleRate.orNull, d.channels.orNull, d.durationMs.orNull,
          d.features.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  // ------------------------------------------------------------------
  // Real-codec round trip: hand-constructed BMP/WAV payloads decoded by
  // the JDK's REAL codecs. The byte layouts are built here from the
  // published format specs, independently of ImageIO / javax.sound, so
  // a decode is a genuine cross-implementation check — and because the
  // construction rule is plain arithmetic over the source bytes, a SQL
  // oracle can predict the decoded metadata exactly. This is what turns
  // the real-codec path from rows-only into a hash-matched entry.
  // ------------------------------------------------------------------

  /** Minimal valid 24bpp uncompressed (BI_RGB) bottom-up BMP:
    * 14-byte file header + 40-byte BITMAPINFOHEADER + zeroed pixel rows
    * padded to 4-byte boundaries. */
  def buildBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54)  // pixel offset
      .putInt(40)                                           // info header size
      .putInt(width).putInt(height)
      .putShort(1)                                          // planes
      .putShort(24)                                         // bits per pixel
      .putInt(0)                                            // BI_RGB
      .putInt(imageSize)
      .putInt(2835).putInt(2835)                            // 72 dpi in px/m
      .putInt(0).putInt(0)                                  // palette: none
    b.array()                                               // pixels stay zero
  }

  /** Minimal valid PCM-16 WAV: RIFF header + fmt chunk + zeroed data
    * chunk of `frames` sample frames. */
  def buildWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    val dataSize = frames * channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                          // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)                    // byte rate
      .putShort((channels * 2).toShort)                     // block align
      .putShort(16)                                         // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array()                                               // samples stay zero
  }

  val roundTripSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** For each (media_id, payload) row: derive deterministic image/audio
    * parameters from the payload bytes, CONSTRUCT a valid BMP and WAV,
    * and decode them with the real JDK codecs ([[decodeImage]] /
    * [[decodeAudio]]). The emitted metadata is what the codecs read back
    * — a decoder bug surfaces as a hash mismatch against the arithmetic
    * oracle. Payloads and constructed media never leave their partition. */
  def codecRoundTrip(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val p = if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx)
        val n = p.length
        // same first-two-byte rule as decodeStub, so the SQL oracle's
        // hex() machinery carries over unchanged
        val w = 1 + (if (n > 0) p(0) & 0x3F else 0)
        val h = 1 + (if (n > 1) p(1) & 0x3F else 0)
        val rate = 8000 + (n % 8) * 1000
        val ch = 1 + (id % 2).toInt
        val frames = 1 + n % 1000
        val (dw, dh) = decodeImage(buildBmp(w, h))
          .getOrElse((-1, -1))
        val (dRate, dCh, dMs) = decodeAudio(buildWav(rate, ch, frames))
          .getOrElse((-1, -1, -1L))
        Row(id, n, dw, dh, dRate, dCh, dMs)
      }
    }
    spark.createDataFrame(rdd, roundTripSchema)
  }

  /** 24bpp BI_RGB bottom-up BMP with CONTENT: per-pixel gray levels from
    * the supplied function (equal R=G=B), rows padded to 4 bytes. The
    * pixel-carrying sibling of [[buildBmp]]; `gray(x, y)` uses top-based
    * y, the builder handles the format's bottom-up row order. */
  def buildGrayBmp(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54)
      .putInt(40)
      .putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val arr = b.array()
    var yTop = 0
    while (yTop < height) {
      val rowOff = 54 + (height - 1 - yTop) * rowSize // bottom-up storage
      var x = 0
      while (x < width) {
        val g = (gray(x, yTop) & 0xFF).toByte
        val o = rowOff + x * 3
        arr(o) = g; arr(o + 1) = g; arr(o + 2) = g // B, G, R equal
        x += 1
      }
      yTop += 1
    }
    arr
  }

  /** dHash grid geometry: the canonical 9x8 difference grid, constructed
    * from an 18x16 source so the area-average downsample (2x2 integer
    * mean) is a REAL resample step, not a no-op. */
  val dhashSrcW = 18
  val dhashSrcH = 16

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("dh_hi", LongType, nullable = false),
    StructField("dh_lo", LongType, nullable = false)))

  /** Perceptual image fingerprint (dHash, the difference-hash of the
    * pHash family) over the REAL decode path. Per row:
    *  1. construct an 18x16 gray BMP whose pixel levels are the payload
    *     bytes cycled (g(x,y) = payload[(y*18+x) mod n]; empty -> 0),
    *  2. decode it with the real JDK ImageIO codec — the hash is
    *     computed from what the CODEC returns, so a decoder mis-parse
    *     (row order, padding, channel order) breaks the oracle hash,
    *  3. area-average to the canonical 9x8 dHash grid (2x2 integer mean
    *     — floor(sum/4), exact in both engines),
    *  4. emit the 64 horizontal-gradient bits cell(x,y) > cell(x+1,y)
    *     as two 32-bit halves (rows 0-3 -> dh_hi, rows 4-7 -> dh_lo;
    *     bit (y%4)*8+x) — non-negative BIGINTs on any engine, hamming =
    *     bit_count(xor(hi)) + bit_count(xor(lo)).
    * Payloads and pixels never leave their partition; output is 20
    * bytes/row regardless of image size — the shape that scales. */
  /** The per-payload dHash kernel behind [[imageDHash]] and the
    * streaming image-dedup gate: construct, REAL-decode, downsample,
    * compare. Returns the two 32-bit halves. */
  def dhashOf(payload: Array[Byte]): (Long, Long) = {
    val p = if (payload == null) Array.emptyByteArray else payload
    val n = p.length
    def gray(x: Int, y: Int): Int =
      if (n == 0) 0 else p((y * dhashSrcW + x) % n) & 0xFF
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(buildGrayBmp(dhashSrcW, dhashSrcH, gray)))
    // cells from DECODED pixels (blue channel; channels are equal)
    def cell(cx: Int, cy: Int): Int = {
      val x0 = cx * 2; val y0 = cy * 2
      ((img.getRGB(x0, y0) & 0xFF) + (img.getRGB(x0 + 1, y0) & 0xFF) +
        (img.getRGB(x0, y0 + 1) & 0xFF) + (img.getRGB(x0 + 1, y0 + 1) & 0xFF)) / 4
    }
    var hi = 0L; var lo = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cell(cx, cy) > cell(cx + 1, cy)) {
          val bit = 1L << ((cy % 4) * 8 + cx)
          if (cy < 4) hi |= bit else lo |= bit
        }
        cx += 1
      }
      cy += 1
    }
    (hi, lo)
  }

  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val p = if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx)
        val (hi, lo) = dhashOf(p)
        Row(id, p.length, hi, lo)
      }
    }
    spark.createDataFrame(rdd, dhashSchema)
  }

  /** Frame-sample a video payload: emit one row per sampled frame (fake
    * frames = fixed-stride byte slices; the contract — posexplode shape,
    * per-frame ordinals, bounded fan-out — is the real one). */
  def sampleFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    val decoded = decodeAndFeaturize(media)
    decoded
      .withColumn("frame_no",
        explode(sequence(lit(0),
          expr(s"CAST((n_frames - 1) DIV $everyN AS INT) * $everyN"),
          lit(everyN))))
      .select(col("media_id"), col("frame_no"), col("width"), col("height"))
  }

  /** "Resize": emit target dims alongside source dims — metadata-only in
    * the stub, a byte-transforming mapPartitions in production. */
  def resizeMeta(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    decodeAndFeaturize(media)
      .select(col("media_id"), col("width").as("src_w"), col("height").as("src_h"),
        lit(targetW).as("dst_w"), lit(targetH).as("dst_h"),
        (col("n_bytes") * (lit(targetW * targetH)
          / (col("width") * col("height")).cast("double"))).cast("int")
          .as("est_bytes"))
}
