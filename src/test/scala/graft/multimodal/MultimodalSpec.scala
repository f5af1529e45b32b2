package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table schema: opaque binary + typed columns") {
    val media = Multimodal.fromDocuments(spark, sf)
    val types = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("content") == "binary")
    assert(types("kind") == "string")
    assert(media.count() == 500)
  }

  test("extractFeatures: decode stub yields deterministic meta + features") {
    val media = Multimodal.fromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.meta.nBytes > 0)
      assert(r.meta.format == "png") // fake header sniffed
      assert(r.features.length == 8)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("features survive partitioning changes (no driver-side state)") {
    val media = Multimodal.fromDocuments(spark, sf).repartition(7)
    val ids = Multimodal.extractFeatures(media).collect().map(_.media_id).sorted
    assert(ids.toSeq == (0L until 500L))
  }

  test("resize + frame sampling stubs keep plumbing shape") {
    val media = Multimodal.fromDocuments(spark, sf)
    assert(Multimodal.resized(media, 32, 32).count() == 500)
    val frames = Multimodal.sampledFrames(media.limit(10), frames = 4)
    assert(frames.count() <= 40 && frames.count() > 0)
    assert(frames.collect().forall(_.kind == "image"))
  }
}
