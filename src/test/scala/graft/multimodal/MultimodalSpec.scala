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

  // ── real header parsing (byte-exact fixtures, spec-built) ────────────

  /** Minimal valid PNG prefix: signature + IHDR with the given dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be(13) ++ "IHDR".getBytes("US-ASCII") ++ be(w) ++ be(h) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth, color type, etc.
  }

  /** Minimal 16-bit PCM WAV header, optionally with a LIST chunk before
    * fmt/data to exercise the chunk walk; declared dataLen, no payload. */
  private def wavBytes(channels: Int, sampleRate: Int, byteRate: Int,
      dataLen: Int, withList: Boolean = false): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val list = if (withList)
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII")
    else Array.empty[Byte]
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++ list ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++ le32(byteRate) ++
      le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen)
  }

  test("HeaderCodec parses real PNG dimensions and rejects malformed headers") {
    assert(HeaderCodec.parsePng(pngBytes(100, 200)) == Some((100, 200)))
    assert(HeaderCodec.parsePng(pngBytes(1, 1)) == Some((1, 1)))
    val corrupt = pngBytes(100, 200); corrupt(1) = 'Q' // break the magic
    assert(HeaderCodec.parsePng(corrupt).isEmpty)
    val notIhdr = pngBytes(100, 200); notIhdr(12) = 'X'
    assert(HeaderCodec.parsePng(notIhdr).isEmpty)
    assert(HeaderCodec.parsePng(pngBytes(100, 200).take(20)).isEmpty) // truncated
    assert(HeaderCodec.parsePng(pngBytes(0, 5)).isEmpty) // zero dim invalid
  }

  test("HeaderCodec walks RIFF chunks: fmt/data found past a LIST chunk") {
    val direct = HeaderCodec.parseWav(wavBytes(1, 8000, 16000, 16000))
    assert(direct == Some(HeaderCodec.WavMeta(1, 8000, 16000, 16000L, 1000L)))
    val listed = HeaderCodec.parseWav(
      wavBytes(2, 44100, 176400, 882000, withList = true))
    assert(listed == Some(HeaderCodec.WavMeta(2, 44100, 176400, 882000L, 5000L)))
    assert(HeaderCodec.parseWav(wavBytes(1, 8000, 0, 100)).isEmpty) // rate 0 guard
    assert(HeaderCodec.parseWav("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
  }

  test("extractFeatures uses real header meta when present, stub otherwise") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(640, 480)),
      Multimodal.MediaRow(2L, "audio", wavBytes(1, 8000, 16000, 48000)),
      Multimodal.MediaRow(3L, "image", "garbage payload".getBytes("UTF-8")))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f.meta).toMap
    assert(out(1L).format == "png" && out(1L).width == 640 && out(1L).height == 480)
    assert(out(2L).format == "wav" && out(2L).durationMs == 3000L)
    // unknown container falls back to the stub — no crash, sane fields
    assert(out(3L).nBytes == 15L && out(3L).width > 0)
  }
}
