package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the baseline JFIF codec's contracts: bit-exact decode for the
  * flat-block DC-only construction (the q206 gate's exactness argument),
  * bounded reconstruction error for general content (lossy by design,
  * never unbounded), scope rejection (progressive / truncated / corrupt →
  * None, never garbage pixels), and the 4:2:0 interleaved-MCU path. */
class JpegCodecSpec extends AnyFunSuite {

  private def flatBlocks(w: Int, h: Int, seed: Int): PngCodec.PngImage = {
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((seed * 37 + (by * (w / 8) + bx) * 29) % 256).toByte
    }
    PngCodec.PngImage(w, h, 1, px)
  }

  private def gradient(w: Int, h: Int, ch: Int, seed: Int): PngCodec.PngImage =
    PngCodec.PngImage(w, h, ch,
      Array.tabulate(w * h * ch)(i => ((seed * 31 + i * 7) % 256).toByte))

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"length ${a.length} vs ${b.length}")
    a.indices.foldLeft(0)((m, i) =>
      math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))))
  }

  test("flat-block grayscale decodes BIT-EXACTLY at quant=1 (the q206 exactness contract)") {
    for (seed <- Seq(0, 1, 7, 100, 255); (w, h) <- Seq((16, 16), (24, 16), (32, 24))) {
      val img = flatBlocks(w, h, seed)
      val bytes = JpegCodec.encode(img, quant = 1)
      val d = JpegCodec.decode(bytes)
      assert(d.isDefined, s"decode failed seed=$seed ${w}x$h")
      assert(d.get.width == w && d.get.height == h && d.get.channels == 1)
      assert(java.util.Arrays.equals(d.get.pixels, img.pixels),
        s"flat-block decode not exact seed=$seed ${w}x$h " +
          s"(maxDiff=${maxAbsDiff(d.get.pixels, img.pixels)})")
    }
  }

  test("flat-block decode stays exact at non-multiple-of-8 dims (edge-replicated partial blocks)") {
    // 20x13: right/bottom blocks are partial; encoder pads by replication,
    // decoder crops — padding a FLAT block with its own value keeps the
    // block flat, so exactness must survive
    val w = 20; val h = 13
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((91 + (by * 3 + bx) * 29) % 256).toByte
    }
    val img = PngCodec.PngImage(w, h, 1, px)
    val d = JpegCodec.decode(JpegCodec.encode(img, quant = 1))
    assert(d.isDefined && d.get.width == w && d.get.height == h)
    assert(java.util.Arrays.equals(d.get.pixels, img.pixels))
  }

  test("grayscale gradient round-trips with small bounded error at quant=1") {
    val img = gradient(24, 16, 1, seed = 11)
    val d = JpegCodec.decode(JpegCodec.encode(img, quant = 1))
    assert(d.isDefined)
    // quant=1 loses only coefficient rounding (≤0.5 per coefficient);
    // reconstruction error stays a few grey levels
    val diff = maxAbsDiff(d.get.pixels, img.pixels)
    assert(diff <= 4, s"gradient error $diff > 4 at quant=1")
  }

  test("coarser quantization degrades gracefully and keeps dims/channels") {
    val img = gradient(16, 16, 1, seed = 5)
    for (q <- Seq(2, 8, 32)) {
      val d = JpegCodec.decode(JpegCodec.encode(img, q))
      assert(d.isDefined && d.get.width == 16 && d.get.height == 16)
      val diff = maxAbsDiff(d.get.pixels, img.pixels)
      assert(diff <= 16 * q, s"error $diff unreasonably large at quant=$q")
    }
  }

  test("RGB 4:4:4 color round-trips within color-matrix rounding error") {
    // flat-color image: spatial DCT is exact (DC-only), so the only loss
    // is the YCbCr<->RGB double-rounding — a couple of levels per channel
    val px = Array.tabulate(16 * 16 * 3) { i =>
      Seq(200.toByte, 60.toByte, 110.toByte)(i % 3)
    }
    val img = PngCodec.PngImage(16, 16, 3, px)
    val d = JpegCodec.decode(JpegCodec.encode(img, quant = 1))
    assert(d.isDefined && d.get.channels == 3)
    val diff = maxAbsDiff(d.get.pixels, img.pixels)
    assert(diff <= 2, s"flat-color RGB error $diff > 2")
    // non-flat color content: bounded, looser
    val img2 = gradient(16, 16, 3, seed = 9)
    val d2 = JpegCodec.decode(JpegCodec.encode(img2, quant = 1))
    assert(d2.isDefined)
    assert(maxAbsDiff(d2.get.pixels, img2.pixels) <= 8)
  }

  test("4:2:0 subsampled encode exercises the interleaved-MCU + upsample path") {
    // flat color: chroma mean-pool of a constant is the constant, so the
    // subsampled round-trip stays within the same matrix-rounding budget
    val px = Array.tabulate(32 * 16 * 3) { i =>
      Seq(90.toByte, 180.toByte, 40.toByte)(i % 3)
    }
    val img = PngCodec.PngImage(32, 16, 3, px)
    val bytes = JpegCodec.encode420(img, quant = 1)
    val d = JpegCodec.decode(bytes)
    assert(d.isDefined, "4:2:0 decode failed")
    assert(d.get.width == 32 && d.get.height == 16 && d.get.channels == 3)
    assert(maxAbsDiff(d.get.pixels, img.pixels) <= 2,
      "flat-color 4:2:0 round-trip outside rounding budget")
    // sanity: the stream really declares 2x2 luma sampling (SOF walk)
    assert(JpegCodec.parseHeader(bytes).contains((32, 16, 3)))
  }

  test("Y-subsampled stream (Y 1x1, chroma 2x2) decodes through the non-max-luma path") {
    // legal-but-unusual baseline layout: luma is NOT the max-sampled
    // component, so the assembly loop must scale Y's plane indices by its
    // sampling ratio (indexing Y at full output resolution read past the
    // plane before the r09 fix). Flat color: the 2x mean-pooled luma of a
    // constant is the constant, so the round-trip stays within the
    // color-matrix rounding budget.
    val px = Array.tabulate(32 * 16 * 3) { i =>
      Seq(120.toByte, 200.toByte, 80.toByte)(i % 3)
    }
    val img = PngCodec.PngImage(32, 16, 3, px)
    val bytes = JpegCodec.encodeSampled(img, quant = 1, ySamp = 1, cSamp = 2)
    assert(JpegCodec.parseHeader(bytes).contains((32, 16, 3)))
    val d = JpegCodec.decode(bytes)
    assert(d.isDefined, "Y-subsampled decode failed")
    assert(d.get.width == 32 && d.get.height == 16 && d.get.channels == 3)
    assert(maxAbsDiff(d.get.pixels, img.pixels) <= 2,
      "flat-color Y-subsampled round-trip outside rounding budget")
  }

  test("decode rejects out-of-scope or corrupt streams with None, never garbage") {
    val good = JpegCodec.encode(flatBlocks(16, 16, 1), quant = 1)
    assert(JpegCodec.decode(good).isDefined)
    // not a JPEG at all
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    // truncated: cut inside the entropy-coded data
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
    // a BASELINE stream with its SOF0 marker rewritten to SOF2 claims to
    // be progressive but carries a (0,63) full-band scan header — illegal
    // for progressive (DC scans are exactly the (0,0) band), so the
    // progressive path must refuse it rather than misread baseline
    // entropy data. parseHeader (metadata-only) now reports dims for
    // real SOF2 streams, including this crafted one.
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty,
      "baseline-shaped scan header under SOF2 must be rejected")
    assert(JpegCodec.parseHeader(prog).contains((16, 16, 1)))
    // corrupt entropy data: flip bytes mid-stream until a failure mode
    // (either None or a decode that still terminates — never a crash)
    val corrupt = good.clone()
    for (i <- good.length - 20 until good.length - 2) corrupt(i) = 0x55
    JpegCodec.decode(corrupt) // must not throw
  }

  // ── Progressive (SOF2) ───────────────────────────────────────────────

  test("progressive flat-block grayscale decodes BIT-EXACTLY at quant=1 (extends the q206 contract)") {
    for ((w, h) <- Seq((16, 16), (24, 16), (19, 13))) {
      val img = flatBlocks(w, h, seed = w + h)
      val bytes = JpegCodec.encodeProgressive(img, quant = 1)
      // it really is a progressive stream, not a baseline fallback
      val sofAt = bytes.indices.find(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2)
      assert(sofAt.isDefined, "encodeProgressive must emit SOF2")
      val d = JpegCodec.decode(bytes)
      assert(d.isDefined, s"progressive decode failed for ${w}x$h")
      assert(d.get.width == w && d.get.height == h && d.get.channels == 1)
      assert(java.util.Arrays.equals(d.get.pixels, img.pixels),
        s"progressive flat-block decode not bit-exact at ${w}x$h")
    }
  }

  test("progressive == baseline decode for the SAME image at the same quant (identical coefficients)") {
    // the scan script transmits exactly the quantized coefficient table,
    // so progressive and baseline decodes must agree pixel-for-pixel —
    // on gradients (full AC content: EOBRUN, ZRL, newly-nonzero and
    // correction-bit paths all exercised) and in color
    for (quant <- Seq(1, 4); ch <- Seq(1, 3)) {
      val img = gradient(21, 17, ch, seed = quant * 7 + ch)
      val base = JpegCodec.decode(JpegCodec.encode(img, quant))
      val prog = JpegCodec.decode(JpegCodec.encodeProgressive(img, quant))
      assert(base.isDefined && prog.isDefined, s"quant=$quant ch=$ch")
      assert(java.util.Arrays.equals(base.get.pixels, prog.get.pixels),
        s"progressive decode diverges from baseline at quant=$quant ch=$ch")
    }
  }

  test("progressive gradient round-trips with small bounded error (lossy, never unbounded)") {
    val img = gradient(24, 24, 1, seed = 9)
    val d = JpegCodec.decode(JpegCodec.encodeProgressive(img, quant = 1))
    assert(d.isDefined)
    assert(maxAbsDiff(d.get.pixels, img.pixels) <= 2)
  }

  /** (sosStart, entropyEnd) span of every scan: SOS header + entropy data
    * up to the next true marker (FF followed by neither 00-stuffing nor
    * an RSTn). Used to splice scans out of a stream. */
  private def scanSpans(b: Array[Byte]): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 2
    var stop = false
    while (!stop && off + 4 <= b.length) {
      val m = b(off + 1) & 0xff
      if ((b(off) & 0xff) != 0xff || m == 0xd9) stop = true
      else {
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (m == 0xda) {
          var p = off + 2 + len
          var end = -1
          while (end < 0 && p + 1 < b.length) {
            if ((b(p) & 0xff) == 0xff) {
              val n = b(p + 1) & 0xff
              if (n != 0 && !(n >= 0xd0 && n <= 0xd7)) end = p else p += 2
            } else p += 1
          }
          if (end < 0) end = b.length
          spans += ((off, end))
          off = end
        } else off += 2 + len
      }
    }
    spans.toSeq
  }

  private def splice(b: Array[Byte], drop: Seq[(Int, Int)]): Array[Byte] = {
    val keep = Array.fill(b.length)(true)
    drop.foreach { case (s, e) => (s until e).foreach(keep(_) = false) }
    b.indices.filter(keep).map(b).toArray
  }

  test("progressive scan script without a DC scan is rejected (T.81 G.1.1.1.1 / libjpeg first-scan-must-be-DC)") {
    // splice the DC first scan AND DC refinement out of a 4-scan
    // grayscale progressive stream, leaving AC-only scans: decoding the
    // partially-populated coefficient store would be garbage, so the
    // codec must return None (the 'None, never garbage' contract)
    val img = gradient(24, 16, 1, seed = 3)
    val bytes = JpegCodec.encodeProgressive(img, quant = 1)
    val spans = scanSpans(bytes)
    assert(spans.length == 4, s"expected 4 scans, got ${spans.length}")
    val acOnly = splice(bytes, spans.take(2))
    assert(JpegCodec.decode(acOnly).isEmpty,
      "AC-only progressive scan script must be rejected")
    // dropping only the AC scans (DC-only prefix) must still DECODE: a
    // truncated progressive script is a legal prefix (coarse image)
    val dcOnly = splice(bytes, spans.drop(2))
    assert(JpegCodec.decode(dcOnly).isDefined,
      "DC-only truncated script is a legal progressive prefix")
    // dropping just the DC REFINEMENT keeps the required DC first scan:
    // decodes at coarser DC precision, must not be rejected
    val noRefine = splice(bytes, Seq(spans(1)))
    assert(JpegCodec.decode(noRefine).isDefined,
      "missing DC refinement is a legal truncation, not a rejection")
  }

  test("progressive rejects truncation and scan-header abuse with None, never garbage") {
    val good = JpegCodec.encodeProgressive(flatBlocks(16, 16, 3), quant = 1)
    assert(JpegCodec.decode(good).isDefined)
    // cut inside a scan's entropy data
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
    // cut just before EOI: the last scan's trailing marker is gone
    assert(JpegCodec.decode(good.dropRight(2)).isEmpty)
    // parseHeader reports dims for the metadata path
    assert(JpegCodec.parseHeader(good).contains((16, 16, 1)))
    // header dispatcher sees it as an image too
    assert(HeaderCodec.decode("image", good).exists(m =>
      m.format == "jpeg" && m.width == 16 && m.height == 16))
  }

  test("allocation guards: header-declared huge dims reject BEFORE allocating (crafted-stream OOM defense)") {
    // a few-hundred-byte stream whose SOF0 declares 32000×32000 must not
    // trigger a ~4 GB plane allocation on the crawl-ingest path: patch a
    // real stream's SOF dims (offset: FFC0 len(2) precision(1) h(2) w(2))
    val good = JpegCodec.encode(flatBlocks(16, 16, 1), quant = 1)
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    def withDims(h: Int, w: Int): Array[Byte] = {
      val b = good.clone()
      b(sofAt + 5) = ((h >> 8) & 0xff).toByte; b(sofAt + 6) = (h & 0xff).toByte
      b(sofAt + 7) = ((w >> 8) & 0xff).toByte; b(sofAt + 8) = (w & 0xff).toByte
      b
    }
    // past the documented tens-of-megapixel regime → None (plane cap)
    assert(JpegCodec.decode(withDims(32000, 32000)).isEmpty)
    // under the plane cap but structurally truncated: 4000×4000 needs
    // ≥ 2 bits/block = 62.5 KB of entropy data this stream can't hold
    assert(JpegCodec.decode(withDims(4000, 4000)).isEmpty)
    // the patch rig itself is sound: original dims still decode
    assert(JpegCodec.decode(withDims(16, 16)).isDefined)
    // header parsing (metadata path) is allocation-free and still
    // reports the declared dims — only DECODE refuses
    assert(JpegCodec.parseHeader(withDims(32000, 32000))
      .contains((32000, 32000, 1)))
  }

  test("parseHeader reports dims for the metadata path and HeaderCodec dispatches jpeg") {
    val bytes = JpegCodec.encode(flatBlocks(24, 16, 3), quant = 1)
    assert(JpegCodec.parseHeader(bytes).contains((24, 16, 1)))
    val meta = HeaderCodec.decode("image", bytes)
    assert(meta.isDefined)
    assert(meta.get.format == "jpeg" && meta.get.width == 24 && meta.get.height == 16)
  }

  test("EXIF APP1: round-trip, both byte orders, malformed -> None, decode-transparent") {
    val base = JpegCodec.encode(flatBlocks(24, 16, 3), quant = 1)
    // absent EXIF -> None
    assert(JpegCodec.parseExif(base).isEmpty)
    // big-endian writer round-trip, all 8 orientations
    (1 to 8).foreach { o =>
      val j = JpegCodec.insertApp1(base,
        JpegCodec.exifApp1(o, "2026:01:15 12:00:00"))
      assert(JpegCodec.parseExif(j).contains((o, Some("2026:01:15 12:00:00"))))
      // the APP1 must be transparent to header + pixel paths
      assert(JpegCodec.parseHeader(j).contains((24, 16, 1)))
      assert(JpegCodec.decode(j).map(_.pixels.toSeq) ==
        JpegCodec.decode(base).map(_.pixels.toSeq))
    }
    // little-endian ("II") TIFF, hand-built: orientation 6, no DateTime
    val ii = {
      val bos = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      bos.write("II".getBytes("US-ASCII")); w16(42); w32(8)
      w16(1); w16(0x0112); w16(3); w32(1); w16(6); w16(0); w32(0)
      val p = "Exif\u0000\u0000".getBytes("US-ASCII") ++ bos.toByteArray
      Array[Byte](0xff.toByte, 0xe1.toByte,
        ((p.length + 2) >>> 8).toByte, ((p.length + 2) & 0xff).toByte) ++ p
    }
    assert(JpegCodec.parseExif(JpegCodec.insertApp1(base, ii))
      .contains((6, None)))
    // malformed arms: broken TIFF body, bad magic, truncated IFD,
    // out-of-range orientation — all None, and all decode-transparent
    val broken = JpegCodec.insertApp1(base, JpegCodec.exifApp1Malformed)
    assert(JpegCodec.parseExif(broken).isEmpty)
    assert(JpegCodec.decode(broken).map(_.pixels.toSeq) ==
      JpegCodec.decode(base).map(_.pixels.toSeq))
    val good = JpegCodec.exifApp1(3, "2026:01:15 12:00:00")
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(i) = v.toByte; c
    }
    // TIFF magic 42 -> 43 (offset: 4 marker+len, 6 sig, 2 order, +1)
    assert(JpegCodec.parseExif(
      JpegCodec.insertApp1(base, mut(4 + 6 + 3, 43))).isEmpty)
    // orientation value 9 (entry value lives at tiff+8+2+8 = +18)
    assert(JpegCodec.parseExif(
      JpegCodec.insertApp1(base, mut(4 + 6 + 19, 9))).isEmpty)
  }

  test("DC differential chain: a corrupted early block cannot decode to the original tail") {
    // pins the gate's tamper argument: DC coding is differential, so the
    // pixel content of later blocks depends on every earlier DC — flip a
    // byte in the FIRST entropy bytes and either decode fails or the
    // raster differs from the original (it cannot silently agree)
    val img = flatBlocks(32, 24, 42)
    val bytes = JpegCodec.encode(img, quant = 1)
    val sosAt = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda).get
    val entStart = sosAt + 2 + (((bytes(sosAt + 2) & 0xff) << 8) | (bytes(sosAt + 3) & 0xff))
    val tampered = bytes.clone()
    tampered(entStart) = (tampered(entStart) ^ 0x40).toByte
    val d = JpegCodec.decode(tampered)
    assert(d.isEmpty || !java.util.Arrays.equals(d.get.pixels, img.pixels))
  }
}
