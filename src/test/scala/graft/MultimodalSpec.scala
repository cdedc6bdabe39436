package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaAsset, StubCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(id: Long, bytes: Array[Byte]) =
    MediaAsset(id, "image", bytes, 640, 480, 0L)

  test("StubCodec is deterministic and byte-exact") {
    val b = "hello world".getBytes("UTF-8")
    assert(StubCodec.fnv64(b) === StubCodec.fnv64(b.clone()))
    assert(StubCodec.brightness(Array[Byte](0, -1)) === (255.0 / 2 / 255.0))
    assert(math.abs(StubCodec.histogram8(b).sum - 1.0f) < 1e-6)
    assert(StubCodec.resample(b, 4).length === 4)
    // chunks of 4: "hell","o wo","rld"; stride 2 keeps indices 0 and 2
    assert(StubCodec.sampleFrames(b, 4, 2).map(_.toSeq)
      === Seq("hell".getBytes.toSeq, "rld".getBytes.toSeq))
  }

  test("extractFeatures preserves ids and computes stub features") {
    implicit val sp = spark
    val ds = Seq(
      asset(1L, Array[Byte](0, 0, 0, 0)),
      asset(2L, Array[Byte](-1, -1, -1, -1))).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.assetId)
    assert(out.map(_.assetId).toSeq === Seq(1L, 2L))
    assert(out(0).brightness === 0.0)
    assert(math.abs(out(1).brightness - 1.0) < 1e-12)
    assert(out.forall(_.features.length === 8))
  }

  test("resizeAll bounds payload size; sampleFrames explodes with frame index") {
    implicit val sp = spark
    val big = asset(1L, Array.tabulate(1000)(_.toByte))
    val resized = Multimodal.resizeAll(Seq(big).toDS(), 64).collect().head
    assert(resized.payload.length === 64)
    val frames = Multimodal.sampleFrames(Seq(big).toDS(), frameSize = 100, stride = 3)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.length === 4) // chunks 0,3,6,9 of 10
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2, 3))
  }

  test("assetsFromDocuments: payload is the UTF-8 text, pipeline runs on fixture") {
    implicit val sp = spark
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(assets)
    val n = feats.count()
    assert(n === Tables.documents(spark, sf).count())
    val medias = feats.toDF().select("mediaType").distinct()
      .collect().map(_.getString(0)).toSet
    assert(medias === Set("image", "audio", "video"))
  }
}
