package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = graft.GraftSession.local(4)

  private def media(rows: (Long, Array[Byte], String)*) = {
    val rdd = spark.sparkContext.parallelize(
      rows.map { case (id, p, t) => Row(id, p, t) })
    spark.createDataFrame(rdd, Multimodal.mediaSchema)
  }

  test("decode stub is deterministic and shape-correct") {
    val bytes = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val (w, h, f, feat) = Multimodal.decodeStub(bytes)
    val again = Multimodal.decodeStub(bytes)
    assert((w, h, f) == (again._1, again._2, again._3))
    assert(feat.toSeq == again._4.toSeq)
    assert(w >= 1 && w <= 64 && h >= 1 && h <= 64)
    assert(f == 1 + 10000 / 4096)
    assert(feat.length == 16)
  }

  test("decodeAndFeaturize preserves ids, handles null payloads, batches") {
    val df = media(
      (1L, "hello world media bytes".getBytes, "image"),
      (2L, null, "audio"),
      (3L, Array.tabulate[Byte](9000)(_.toByte), "video"))
    val out = Multimodal.decodeAndFeaturize(df).orderBy("media_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(1).getInt(2) == 0) // null payload -> 0 bytes
    assert(out(2).getInt(5) == 1 + 9000 / 4096) // n_frames
    assert(out(0).getSeq[Float](9).length == 16)
    // schema contract
    assert(Multimodal.decodeAndFeaturize(df).schema == Multimodal.decodedSchema)
  }

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("real PNG and JPEG dimensions via javax.imageio") {
    val png = imageBytes("png", 37, 21)
    val jpg = imageBytes("jpg", 48, 9)
    assert(Multimodal.decodeImage(png).contains((37, 21)))
    assert(Multimodal.decodeImage(jpg).contains((48, 9)))
    // non-image bytes fall back to the stub path
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // end-to-end through the distributed decode: real dims in the frame
    val df = media((1L, png, "image"), (2L, jpg, "image"),
      (3L, "plain text".getBytes, "text"))
    val out = Multimodal.decodeAndFeaturize(df).orderBy("media_id").collect()
    assert((out(0).getInt(3), out(0).getInt(4)) == (37, 21))
    assert((out(1).getInt(3), out(1).getInt(4)) == (48, 9))
    // text row keeps the deterministic stub dims (bounded 1..64)
    assert(out(2).getInt(3) >= 1 && out(2).getInt(3) <= 64)
    // features still populated for real images
    assert(out(0).getSeq[Float](9).exists(_ != 0.0f))
  }

  private def wavBytes(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val data = Array.tabulate[Byte](nFrames * fmt.getFrameSize)(i => (i * 13 % 251).toByte)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV sample rate, channels and duration via javax.sound") {
    // 8 kHz stereo, 4000 frames = exactly 500 ms
    val wav = wavBytes(8000f, 2, 4000)
    assert(Multimodal.decodeAudio(wav).contains((8000, 2, 500L)))
    // non-audio bytes are not misdetected
    assert(Multimodal.decodeAudio("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
    // end-to-end through the distributed decode: audio columns populated
    // for the WAV row, null for image/text rows
    val df = media((1L, wav, "audio"), (2L, imageBytes("png", 5, 4), "image"))
    val out = Multimodal.decodeAndFeaturize(df).orderBy("media_id").collect()
    assert(out(0).getInt(6) == 8000 && out(0).getInt(7) == 2 && out(0).getLong(8) == 500L)
    assert(out(1).isNullAt(6) && out(1).isNullAt(7) && out(1).isNullAt(8))
    assert((out(1).getInt(3), out(1).getInt(4)) == (5, 4))
  }

  test("hand-built BMP and WAV decode to their construction parameters") {
    // the builders write headers per the published specs, independently
    // of the JDK codecs — agreement here is a cross-implementation check
    assert(Multimodal.decodeImage(Multimodal.buildBmp(1, 1)).contains((1, 1)))
    assert(Multimodal.decodeImage(Multimodal.buildBmp(64, 64)).contains((64, 64)))
    assert(Multimodal.decodeImage(Multimodal.buildBmp(13, 57)).contains((13, 57)))
    // odd width exercises the 4-byte row padding
    assert(Multimodal.decodeImage(Multimodal.buildBmp(3, 2)).contains((3, 2)))
    assert(Multimodal.decodeAudio(Multimodal.buildWav(8000, 1, 1))
      .contains((8000, 1, 0L))) // 1 frame @ 8 kHz -> 0.125 ms -> floor 0
    assert(Multimodal.decodeAudio(Multimodal.buildWav(15000, 2, 1000))
      .contains((15000, 2, 66L))) // 1000 * 1000 / 15000 = 66.67 -> 66
    assert(Multimodal.decodeAudio(Multimodal.buildWav(11000, 1, 550))
      .contains((11000, 1, 50L)))
  }

  test("codecRoundTrip: decoded metadata equals the arithmetic rule") {
    val df = media(
      (1L, "ab".getBytes, "text"),          // n=2: w=1+'a'%64, h=1+'b'%64
      (2L, null, "text"),                   // empty payload
      (3L, Array.tabulate[Byte](999)(_.toByte), "text"))
      .select("media_id", "payload")
    val out = Multimodal.codecRoundTrip(df).orderBy("media_id").collect()
    val r1 = out(0)
    assert(r1.getInt(1) == 2)
    assert(r1.getInt(2) == 1 + ('a' & 0x3F) && r1.getInt(3) == 1 + ('b' & 0x3F))
    assert(r1.getInt(4) == 8000 + (2 % 8) * 1000)
    assert(r1.getInt(5) == 2) // doc_id 1 -> 1 + 1%2
    assert(r1.getLong(6) == ((1 + 2) * 1000.0 / 10000).toLong)
    val r2 = out(1)
    assert(r2.getInt(1) == 0 && r2.getInt(2) == 1 && r2.getInt(3) == 1)
    assert(r2.getInt(4) == 8000 && r2.getInt(5) == 1)
    val r3 = out(2)
    assert(r3.getInt(1) == 999)
    assert(r3.getInt(4) == 8000 + (999 % 8) * 1000)
    assert(r3.getLong(6) ==
      ((1 + 999 % 1000) * 1000.0 / (8000 + (999 % 8) * 1000)).toLong)
    assert(Multimodal.codecRoundTrip(df).schema == Multimodal.roundTripSchema)
  }

  test("frame sampling emits stride-spaced ordinals per video") {
    val df = media((7L, Array.tabulate[Byte](12000)(_.toByte), "video"))
    val frames = Multimodal.sampleFrames(df, everyN = 2)
      .orderBy("frame_no").collect()
    // 12000 bytes -> 3 frames -> sampled 0, 2
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
  }

  test("resize metadata scales byte estimate by area ratio") {
    val payload = Array.tabulate[Byte](4000)(_.toByte)
    val df = media((5L, payload, "image"))
    val r = Multimodal.resizeMeta(df, 8, 8).collect()(0)
    assert(r.getAs[Int]("dst_w") == 8 && r.getAs[Int]("dst_h") == 8)
    val srcArea = r.getAs[Int]("src_w") * r.getAs[Int]("src_h")
    val expected = (payload.length * (64.0 / srcArea)).toInt
    assert(r.getAs[Int]("est_bytes") == expected)
  }

  test("imageDHash: real-codec perceptual hash — deterministic, content-sensitive, dup-invariant") {
    import org.apache.spark.sql.types._
    def mediaIdPayload(rows: (Long, Array[Byte])*) = {
      val rdd = spark.sparkContext.parallelize(rows.map { case (id, p) => Row(id, p) })
      spark.createDataFrame(rdd, StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true))))
    }
    val a = "the quick brown fox jumps over the lazy dog repeatedly".getBytes
    val b = "the quick brown fox jumps over the lazy cat repeatedly".getBytes
    val z = "completely different content with other byte statistics here!!".getBytes
    val out = Multimodal.imageDHash(mediaIdPayload(
        (1L, a), (2L, a.clone()), (3L, b), (4L, z), (5L, null)))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // identical payloads -> identical hash (the dedup invariant)
    assert(out(1L) == out(2L))
    // halves are 32-bit non-negative on any engine
    out.values.foreach { case (_, hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32)) }
    // a one-word edit moves FEW bits; unrelated content moves many
    def ham(x: (Int, Long, Long), y: (Int, Long, Long)): Int =
      java.lang.Long.bitCount(x._2 ^ y._2) + java.lang.Long.bitCount(x._3 ^ y._3)
    assert(ham(out(1L), out(3L)) < ham(out(1L), out(4L)),
      s"near edit ${ham(out(1L), out(3L))} !< unrelated ${ham(out(1L), out(4L))}")
    // null payload decodes as the all-zero image: flat gradient, hash 0
    assert(out(5L)._2 == 0L && out(5L)._3 == 0L)
    // the hash is computed from what ImageIO RETURNS: cross-check one
    // cell against the decoded pixels directly
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.buildGrayBmp(Multimodal.dhashSrcW, Multimodal.dhashSrcH,
        (x, y) => a((y * Multimodal.dhashSrcW + x) % a.length) & 0xFF)))
    assert((img.getRGB(0, 0) & 0xFF) == (a(0) & 0xFF),
      "decoded pixel must equal the constructed gray level")
  }
}
