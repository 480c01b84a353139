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
    assert(out(0).getSeq[Float](6).length == 16)
    // schema contract
    assert(Multimodal.decodeAndFeaturize(df).schema == Multimodal.decodedSchema)
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
}
