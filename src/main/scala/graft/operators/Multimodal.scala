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

  /** STUB decode standing in for the remaining codecs (ffmpeg/soundfile in
    * a Pandas-UDF deployment): metadata is a pure deterministic function of
    * the payload bytes. Audio/video payloads go through here; images take
    * the real [[decodeImage]] path. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (if (n > 0) (payload(0) & 0x3F) else 0)
    val height = 1 + (if (n > 1) (payload(1) & 0x3F) else 0)
    val frames = 1 + n / 4096
    (width, height, frames, byteFeatures(payload, dim))
  }

  /** Decode one payload: real ImageIO dimensions when the bytes are a
    * decodable PNG/JPEG/GIF/BMP, the deterministic stub otherwise. */
  def decode(payload: Array[Byte], dim: Int = 16): (Int, Int, Int, Array[Float]) =
    decodeImage(payload) match {
      case Some((w, h)) => (w, h, 1, byteFeatures(payload, dim))
      case None => decodeStub(payload, dim)
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
        val (w, h, f, feat) = decode(payload, dim)
        Row(r.getLong(idIdx),
          if (r.isNullAt(typeIdx)) null else r.getString(typeIdx),
          payload.length, w, h, f, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
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
