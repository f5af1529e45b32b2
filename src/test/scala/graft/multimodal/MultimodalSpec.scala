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

  // ── PNG codec round-trips (REAL pixels, all filter types) ────────────

  private def gradient(w: Int, h: Int, ch: Int, seed: Int): PngCodec.PngImage =
    PngCodec.PngImage(w, h, ch,
      Array.tabulate(w * h * ch)(i => ((seed * 31 + i * 7) % 256).toByte))

  test("PNG encode/decode round-trips byte-exactly for every filter type x channel count") {
    for (filter <- 0 to 4; ch <- Seq(1, 2, 3, 4)) {
      val img = gradient(13, 9, ch, seed = filter * 10 + ch)
      val decoded = PngCodec.decode(PngCodec.encode(img, filter))
      assert(decoded.isDefined, s"decode failed for filter=$filter ch=$ch")
      val d = decoded.get
      assert(d.width == 13 && d.height == 9 && d.channels == ch)
      assert(java.util.Arrays.equals(d.pixels, img.pixels),
        s"pixel mismatch for filter=$filter ch=$ch")
    }
  }

  test("palette PNG (PLTE) round-trips through the indexed encoder and decodes to RGB") {
    // identity-gray palette: index v -> (v, v, v); decoded RGB must equal
    // the gray q103-corpus pixels expanded channel-wise
    val gray = gradient(11, 7, 1, seed = 3)
    val identityPalette = Array.tabulate(768)(i => (i / 3).toByte)
    val bytes = PngCodec.encodeIndexed(11, 7, gray.pixels, identityPalette)
    val d = PngCodec.decode(bytes)
    assert(d.isDefined, "palette decode failed")
    assert(d.get.width == 11 && d.get.height == 7 && d.get.channels == 3)
    val want = gray.pixels.flatMap(v => Array(v, v, v))
    assert(java.util.Arrays.equals(d.get.pixels, want),
      "PLTE expansion diverged from the index pixels")
    // a small NON-gray palette with arbitrary triples
    val pal = Array[Byte](10, 20, 30, 100, -56, 7, 0, -1, 127)
    val idx = Array[Byte](0, 1, 2, 2, 1, 0)
    val d2 = PngCodec.decode(PngCodec.encodeIndexed(3, 2, idx, pal))
    assert(d2.isDefined && d2.get.channels == 3)
    assert(java.util.Arrays.equals(d2.get.pixels,
      idx.flatMap(i => pal.slice(i * 3, i * 3 + 3))))
    // an index past the palette end is corrupt: None, never garbage
    val overIdx = Array[Byte](0, 1, 5, 2, 1, 0)
    assert(PngCodec.decode(PngCodec.encodeIndexed(3, 2, overIdx, pal)).isEmpty)
  }

  test("PNG decode rejects out-of-scope or corrupt containers with None, never garbage") {
    val img = gradient(8, 8, 3, seed = 5)
    val good = PngCodec.encode(img)
    assert(PngCodec.decode(good).isDefined)
    // truncated IDAT (cut mid-stream)
    assert(PngCodec.decode(good.take(good.length - 20)).isEmpty)
    // a palette claim WITHOUT a PLTE chunk is corrupt, not decodable
    val palette = good.clone(); palette(25) = 3
    assert(PngCodec.decode(palette).isEmpty)
    // 16-bit depth out of scope
    val deep = good.clone(); deep(24) = 16
    assert(PngCodec.decode(deep).isEmpty)
    // broken signature
    val bad = good.clone(); bad(1) = 'Q'
    assert(PngCodec.decode(bad).isEmpty)
    assert(PngCodec.decode("not a png at all".getBytes("UTF-8")).isEmpty)
  }

  test("PNG resize resamples real pixels (nearest-neighbor, exact on 2x upscale)") {
    // 2x2 gray image with distinct corners; 4x4 nearest-neighbor doubles each
    val img = PngCodec.PngImage(2, 2, 1, Array[Byte](10, 20, 30, 40))
    val up = PngCodec.resize(img, 4, 4)
    assert(up.pixels.toSeq == Seq[Byte](
      10, 10, 20, 20,
      10, 10, 20, 20,
      30, 30, 40, 40,
      30, 30, 40, 40))
    // downscale back picks the top-left of each 2x2 block = original
    val down = PngCodec.resize(up, 2, 2)
    assert(down.pixels.toSeq == img.pixels.toSeq)
  }

  // ── WAV codec round-trips ────────────────────────────────────────────

  test("pHash is invariant to global brightness shifts where content changes flip it") {
    import graft.multimodal.{Multimodal, PngCodec}
    import spark.implicits._
    // an 8x8 gray image (identity resample), a +40-luma shifted copy
    // (no mod-256 wrap: base stays <= 200), and a content-edited copy
    def png(shift: Int, edit: Boolean): Array[Byte] = {
      val px = Array.tabulate(64) { i =>
        val base = (i * 3 + (i % 8) * 5) % 200
        val v = if (edit && i % 7 == 0) 255 - base else base + shift
        v.toByte
      }
      PngCodec.encode(PngCodec.PngImage(8, 8, 1, px))
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png(0, edit = false)),
      Multimodal.MediaRow(2L, "image", png(40, edit = false)),
      Multimodal.MediaRow(3L, "image", png(0, edit = true)))
    val hs = Multimodal.imagePHash(spark.createDataset(rows))
      .collect().map(h => h.media_id -> h.ahash).toMap
    assert(hs(1L) == hs(2L),
      "a pure brightness shift must not move any AC coefficient")
    assert(hs(1L) != hs(3L), "content edits must flip pHash bits")
  }

  test("WAV PCM16 encode/decode round-trips samples and metadata exactly") {
    val samples = Array.tabulate(300)(i => ((i * 13) % 2001 - 1000).toShort)
    val bytes = WavCodec.encode(samples, 8000)
    val Some((meta, decoded)) = WavCodec.decode(bytes)
    assert(decoded.toSeq == samples.toSeq)
    assert(meta.channels == 1 && meta.sampleRate == 8000)
    assert(meta.dataBytes == 600L)
    assert(meta.durationMs == 600L * 1000 / 16000)
    // stereo interleaved
    val stereo = Array.tabulate(64)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val Some((m2, d2)) = WavCodec.decode(WavCodec.encode(stereo, 44100, channels = 2))
    assert(m2.channels == 2 && m2.sampleRate == 44100 && d2.toSeq == stereo.toSeq)
    // negative samples survive the LE round-trip (sign extension check)
    assert(d2.count(_ < 0) == 32)
  }

  test("WAV decode rejects non-PCM and malformed containers") {
    val bytes = WavCodec.encode(Array[Short](1, 2, 3), 8000)
    val mulaw = bytes.clone(); mulaw(20) = 7 // audioFormat = 7 (mu-law)
    assert(WavCodec.decode(mulaw).isEmpty)
    val bits8 = bytes.clone(); bits8(34) = 8 // bitsPerSample = 8
    assert(WavCodec.decode(bits8).isEmpty)
    assert(WavCodec.decode("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
  }

  // ── motion-PNG stream (video container) ──────────────────────────────

  test("splitFrames recovers each PNG frame from a concatenated stream") {
    val frames = (0 until 3).map(f => PngCodec.encode(gradient(6, 4, 1, seed = f)))
    val stream = frames.flatten.toArray
    val split = Multimodal.splitFrames(stream)
    assert(split.size == 3)
    split.zipWithIndex.foreach { case (fb, i) =>
      assert(java.util.Arrays.equals(fb, frames(i)))
      assert(PngCodec.decode(fb).isDefined)
    }
    assert(Multimodal.splitFrames("no pngs here".getBytes("UTF-8")).isEmpty)
  }

  // ── Spark-side operators over the real codecs ────────────────────────

  test("extractFeatures: decoded meta + features per media kind") {
    val media = Multimodal.fromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.meta.nBytes > 0)
      assert(r.features.length == 8)
      r.media_id % 3 match {
        case 0 =>
          assert(r.meta.format == "png")
          // feature slots 5/6 carry decoded dims == generator dims
          assert(r.features(5) == (8 + r.media_id % 9).toFloat)
          assert(r.features(6) == (8 + r.media_id % 7).toFloat)
        case 1 =>
          assert(r.meta.format == "wav")
          assert(r.features(4) == 8000f) // sample rate from the fmt chunk
          assert(r.features(6) == (256 + r.media_id % 128).toFloat) // n samples
        case _ =>
          assert(r.meta.format == "png-seq")
          assert(r.features(4) == 3f) // frame count
          assert(r.meta.durationMs == 120L)
      }
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

  test("resized decodes, resamples and re-encodes real pixels; audio passes through") {
    val media = Multimodal.fromDocuments(spark, sf).filter(_.media_id < 30)
    val out = Multimodal.resized(media, 16, 16).collect()
    out.foreach { r =>
      r.kind match {
        case "image" =>
          val img = PngCodec.decode(r.content).get
          assert(img.width == 16 && img.height == 16)
        case "video" =>
          val frames = Multimodal.splitFrames(r.content)
          assert(frames.size == 3)
          frames.foreach { f =>
            val img = PngCodec.decode(f).get
            assert(img.width == 16 && img.height == 16)
          }
        case "audio" => // not an image: payload unchanged
          assert(WavCodec.decode(r.content).isDefined)
      }
    }
  }

  test("sampledFrames yields decodable stills: 3 per video, 1 per image, 0 per audio") {
    val media = Multimodal.fromDocuments(spark, sf).filter(_.media_id < 30)
    val frames = Multimodal.sampledFrames(media, frames = 4).collect()
    val byParent = frames.groupBy(_.media_id / 1000)
    (0L until 30L).foreach { id =>
      val n = byParent.get(id).map(_.length).getOrElse(0)
      (id % 3) match {
        case 0 => assert(n == 1, s"image $id")
        case 1 => assert(n == 0, s"audio $id")
        case _ => assert(n == 3, s"video $id")
      }
    }
    frames.foreach(f => assert(PngCodec.decode(f.content).isDefined))
  }

  test("decodedStats matches the generating formula (the q103 contract, locally)") {
    val media = Multimodal.fromDocuments(spark, sf).filter(_.media_id < 60)
    val stats = Multimodal.decodedStats(media).collect().map(s => s.media_id -> s).toMap
    (0L until 60L).foreach { id =>
      val s = stats(id)
      (id % 3) match {
        case 0 =>
          val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
          val units = (0 until w * h).map(i => (id * 31 + i * 7) % 256)
          assert(s.format == "png" && s.n_units == w * h)
          assert(s.unit_sum == units.sum && s.unit_sumsq == units.map(v => v * v).sum)
          assert(s.width == w && s.height == h)
        case 1 =>
          val n = (256 + id % 128).toInt
          val units = (0 until n).map(i => (id * 13 + i * 5) % 2001 - 1000)
          assert(s.format == "wav" && s.n_units == n)
          assert(s.unit_sum == units.sum && s.unit_sumsq == units.map(v => v * v).sum)
          assert(s.duration_ms == n * 2L * 1000 / 16000)
        case _ =>
          val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
          val units = for (f <- 0 until 3; i <- 0 until w * h)
            yield (id * 31 + f * 97 + i * 7) % 256
          assert(s.format == "png-seq" && s.n_units == 3L * w * h)
          assert(s.unit_sum == units.sum && s.unit_sumsq == units.map(v => v * v).sum)
          assert(s.duration_ms == 120L)
      }
    }
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

  test("undecodable payloads degrade to header-only metadata, never crash") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(640, 480)), // header, no IDAT
      Multimodal.MediaRow(2L, "audio", wavBytes(1, 8000, 16000, 48000)),
      Multimodal.MediaRow(3L, "image", "garbage payload".getBytes("UTF-8")))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    // metadata from the real header even when pixel decode is impossible
    assert(out(1L).meta.format == "png" &&
      out(1L).meta.width == 640 && out(1L).meta.height == 480)
    assert(out(1L).features.forall(_ == 0f)) // honest absence, not fabricated
    assert(out(2L).meta.format == "wav" && out(2L).meta.durationMs == 3000L)
    // unknown container: byte count only, zero dims, zero features
    assert(out(3L).meta.format == "bin" && out(3L).meta.nBytes == 15L)
    assert(out(3L).meta.width == 0 && out(3L).features.forall(_ == 0f))
  }

  test("audio energy windows tile each clip exactly and reassemble its totals") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val windows = Multimodal.audioEnergyWindows(media).collect()
      .groupBy(_.media_id)
    val stats = Multimodal.decodedStats(media)
      .filter(_.kind == "audio").collect().map(s => s.media_id -> s).toMap
    assert(windows.keySet == stats.keySet, "every decodable clip must window")
    windows.foreach { case (id, ws) =>
      // windows tile the clip: ids 0..k-1, full 80s then one remainder
      val sorted = ws.sortBy(_.window_id)
      assert(sorted.map(_.window_id).toSeq == (0L until ws.length).toSeq)
      assert(sorted.init.forall(_.len == 80L))
      assert(sorted.map(_.len).sum == stats(id).n_units,
        s"clip $id windows do not tile its samples")
      // exact energy conservation vs the independently-gated q103 totals
      assert(sorted.map(_.sq_sum).sum == stats(id).unit_sumsq,
        s"clip $id window energies do not reassemble unit_sumsq")
    }
    // threshold exercises both outcomes on the fixture corpus
    val flags = windows.values.flatten.map(_.active).toSet
    assert(flags == Set(0L, 1L))
  }

  test("image patches tile each image exactly and reassemble its totals") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val patches = Multimodal.imagePatches(media).collect().groupBy(_.media_id)
    val stats = Multimodal.decodedStats(media)
      .filter(_.kind == "image").collect().map(s => s.media_id -> s).toMap
    assert(patches.keySet == stats.keySet, "every decodable image must patch")
    patches.foreach { case (id, ps) =>
      val st = stats(id)
      // grid covers the image exactly: Σ pw·ph == w·h, no overlaps by
      // construction of the disjoint (row, col) grid
      assert(ps.map(p => p.pw * p.ph).sum == st.width * st.height,
        s"image $id patches do not tile w*h")
      val rows = ps.map(_.patch_row).max + 1
      val cols = ps.map(_.patch_col).max + 1
      assert(ps.length == rows * cols, s"image $id grid has holes")
      // edge clipping: full interior patches are 4x4; clipped edges < 4
      assert(ps.forall(p => p.pw >= 1 && p.pw <= 4 && p.ph >= 1 && p.ph <= 4))
      // exact conservation vs the independently-gated q103 totals
      assert(ps.map(_.px_sum).sum == st.unit_sum &&
        ps.map(_.px_sumsq).sum == st.unit_sumsq,
        s"image $id patch stats do not reassemble the decoded totals")
    }
  }

  test("frame motion: one row per consecutive pair, mismatched dims skipped") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val motion = Multimodal.frameMotion(media).collect().groupBy(_.media_id)
    val videos = Multimodal.decodedStats(media)
      .filter(_.kind == "video").collect().map(s => s.media_id -> s).toMap
    assert(motion.keySet == videos.keySet)
    motion.foreach { case (id, ms) =>
      // 3-frame fixture videos -> exactly pairs (0,1) and (1,2)
      assert(ms.map(m => (m.frame_from, m.frame_to)).toSet ==
        Set((0L, 1L), (1L, 2L)), s"video $id pairs: ${ms.toSeq}")
      // every pair compares the full frame
      val st = videos(id)
      assert(ms.forall(_.n_px == st.width * st.height))
    }
    // a video whose frames change dims mid-stream yields no fabricated row
    val w1 = PngCodec.encode(PngCodec.PngImage(4, 4, 1,
      Array.fill(16)(7.toByte)), 0)
    val w2 = PngCodec.encode(PngCodec.PngImage(5, 4, 1,
      Array.fill(20)(9.toByte)), 0)
    val odd = Seq(Multimodal.MediaRow(99L, "video", w1 ++ w2)).toDS()
    assert(Multimodal.frameMotion(odd).collect().isEmpty)
  }

  test("imageAHash: invariant to PNG filter choice and brightness shift; only images hash") {
    import spark.implicits._
    def hashOf(rows: Seq[Multimodal.MediaRow]): Map[Long, Long] =
      Multimodal.imageAHash(rows.toDS()).collect()
        .map(h => h.media_id -> h.ahash).toMap
    // same pixels encoded under every PNG filter type → identical hash
    // (the hash sees DECODED pixels, never the container encoding)
    val img = gradient(13, 9, 1, seed = 5)
    val perFilter = hashOf((0 to 4).map(f =>
      Multimodal.MediaRow(f.toLong, "image", PngCodec.encode(img, f))))
    assert(perFilter.values.toSet.size == 1,
      s"hash varies with PNG filter type: $perFilter")
    // brightness shift without wraparound → identical hash (every pixel
    // and the mean move together; relative order is what the bits encode)
    val base = PngCodec.PngImage(10, 10, 1,
      Array.tabulate(100)(i => (50 + (i * 97) % 101).toByte))
    val brighter = PngCodec.PngImage(10, 10, 1,
      base.pixels.map(b => (b + 40).toByte))
    val shifted = hashOf(Seq(
      Multimodal.MediaRow(0L, "image", PngCodec.encode(base, 0)),
      Multimodal.MediaRow(1L, "image", PngCodec.encode(brighter, 0))))
    assert(shifted(0L) == shifted(1L),
      "brightness shift changed the perceptual hash")
    // non-image and undecodable rows yield no hash
    val none = hashOf(Seq(
      Multimodal.MediaRow(7L, "audio", Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(8L, "image", Array[Byte](9, 9, 9))))
    assert(none.isEmpty)
    // an exact duplicate image under a different id collides at Hamming 0
    val dup = hashOf(Seq(
      Multimodal.MediaRow(100L, "image", PngCodec.encode(img, 2)),
      Multimodal.MediaRow(200L, "image", PngCodec.encode(img, 4))))
    assert(dup(100L) == dup(200L))
  }

  test("persisted JPEG corpus == fresh synthesis byte-for-byte (q206/q208 serve-path parity)") {
    val fresh = Multimodal.jpegFromDocuments(spark, sf).collect()
      .map(r => r.media_id -> r.content.toSeq).toMap
    val served = Multimodal.jpegCorpus(spark, sf).collect()
      .map(r => r.media_id -> r.content.toSeq).toMap
    assert(served.keySet == fresh.keySet, "corpus id sets differ")
    served.foreach { case (id, bytes) =>
      assert(bytes == fresh(id), s"persisted payload drift for media $id")
    }
    // the serve path really decodes: stats over the persisted corpus are
    // non-degenerate and jpeg-formatted for every row
    val stats = Multimodal.decodedStats(Multimodal.jpegCorpus(spark, sf)).collect()
    assert(stats.length == fresh.size)
    assert(stats.forall(m => m.format == "jpeg" && m.n_units > 0))
  }

  test("imageAHash is container-invariant across baseline and progressive JPEG (the q208 leg accepts SOF2 ingest)") {
    import spark.implicits._
    // identical pixels through three containers: PNG, baseline JPEG and
    // progressive JPEG at quant=1 — the perceptual hash sees DECODED
    // pixels, so a crawl mixing progressive streams lands in the same
    // dedup classes as its baseline re-encodes
    val img = PngCodec.PngImage(16, 16, 1, Array.tabulate(256) { i =>
      val bx = (i % 16) / 8; val by = i / 16 / 8
      ((37 + (by * 2 + bx) * 29) % 256).toByte
    })
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", PngCodec.encode(img, 2)),
      Multimodal.MediaRow(2L, "image", JpegCodec.encode(img, quant = 1)),
      Multimodal.MediaRow(3L, "image", JpegCodec.encodeProgressive(img, quant = 1)))
    val hs = Multimodal.imageAHash(rows.toDS()).collect()
      .map(h => h.media_id -> h.ahash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L), "all three containers must decode")
    assert(hs.values.toSet.size == 1,
      s"perceptual hash varies with container encoding: $hs")
  }

  // ── aHash near-dup counting core (q208's class-collapse + cap) ───────

  /** Scala brute force of the UNBLOCKED truth: for each image, count the
    * others at Hamming ≤ 3. (The pigeonhole block scheme is exact for
    * ≤ 3 flipped bits across 4 blocks — at least one block survives.) */
  private def bruteNearDups(hs: Seq[(Long, Long)]): Map[Long, Long] =
    hs.map { case (id, h) =>
      id -> hs.count { case (oid, oh) =>
        oid != id && java.lang.Long.bitCount(h ^ oh) <= 3 }.toLong
    }.toMap

  test("aHashNearDupCounts == brute force on a near-dup-dense frame (class collapse is exact)") {
    import spark.implicits._
    // 120 images over 9 distinct hashes: base, Hamming-1/2/3 variants
    // (near-dups), a Hamming-4+ outlier family — heavy dup mass per class
    val protos = Seq(0x0123456789ABCDEFL)
    val fam = protos.flatMap(p => Seq(
      p, p ^ 1L, p ^ (1L << 17), p ^ ((1L << 3) | (1L << 40)),
      p ^ ((1L << 1) | (1L << 20) | (1L << 63)),
      p ^ 0xF0L, ~p, ~p ^ 2L, 0L))
    val rows = (0 until 120).map(i => (i.toLong, fam(i % fam.length)))
    val got = Multimodal.aHashNearDupCounts(rows.toDF("media_id", "ahash"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = bruteNearDups(rows)
    assert(got == want,
      s"class-collapse counts diverge from brute force: ${
        got.toSeq.sortBy(_._1).take(5)} vs ${want.toSeq.sortBy(_._1).take(5)}")
  }

  test("aHashNearDupCounts: hot-bucket cap fires only past `cap` distinct hashes and observes the skip") {
    import spark.implicits._
    // full-entropy stress: N distinct hashes all agreeing on block 0
    // (low 16 bits fixed) and mutually Hamming-far elsewhere, so block 0
    // is the ONLY shared bucket and every pair is a candidate the cap
    // can skip. Hamming distance between members is ≥ 4 (distinct high
    // bits spread), so TRUE near-dup count is 0 — the cap can't change
    // correctness here, only candidate work, which is what we observe.
    val n = 12
    // one-hot upper lanes: per-hash distinct in EVERY upper block (no
    // second shared bucket) and pairwise XOR = 2 bits/lane × 3 = 6 > 3
    val rows = (0 until n).map(i =>
      (i.toLong, 0x5A5AL | (1L << (16 + i)) | (1L << (32 + 11 - i))
        | (1L << (48 + 15 - i))))
    // sanity: all share low block, all mutually far
    for (a <- rows; b <- rows if a._1 < b._1)
      assert(java.lang.Long.bitCount(a._2 ^ b._2) > 3)
    val df = rows.toDF("media_id", "ahash")
    // uncapped (cap >= n): exact, equals brute force (all zeros)
    val uncapped = Multimodal.aHashNearDupCounts(df, cap = n,
        observeName = "t_guard_off")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncapped == bruteNearDups(rows))
    // capped at 4: result STILL exact on this frame (skipped candidates
    // were all true negatives) and the observe metric records the skip
    val capped = Multimodal.aHashNearDupCounts(df, cap = 4,
        observeName = "t_guard_default")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped == uncapped,
      "cap changed counts on a frame whose skipped candidates are all true negatives")
    // Metric assertion runs with AQE off: AQE's post-stage re-planning
    // can elide the CollectMetrics node from the FINAL physical plan
    // when the Hamming predicate constrains the pigeonhole join
    // (bisected empirically: the same plan minus the bit_count filter
    // keeps the node; with it, observedMetrics goes empty) — so the
    // production WARN is best-effort under AQE, while the CAP itself is
    // structural (asserted above under default config). Recorded in
    // SCALE.md §observability.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val obsDf = Multimodal.aHashNearDupCounts(df, cap = 4,
        observeName = "t_guard_on")
      assert(obsDf.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        == uncapped)
      val m = obsDf.queryExecution.observedMetrics.get("t_guard_on")
      assert(m.isDefined, "q208-style guard metric was never observed")
      val cappedBuckets = m.get.getLong(0)
      val skippedPairs = m.get.getLong(1)
      // one hot bucket (block 0) past the cap; 12 − 4 = 8 skipped reps
      assert(cappedBuckets == 1L, s"capped_buckets = $cappedBuckets")
      // rows rn = cap+1 .. n each contribute (rn − cap − 1) skipped
      // rep-pair slots: Σ = (n−cap−1)(n−cap)/2
      assert(skippedPairs == (n - 4 - 1).toLong * (n - 4) / 2,
        s"skipped_pairs = $skippedPairs (expected the rn>cap slot count)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
