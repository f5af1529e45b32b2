package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GIF89a codec contracts: BYTE-EXACT encode→decode round-trips (GIF is
  * lossless — grayscale, RGB palettes, interlace, LZW dictionary-growth
  * and KwKwK edge cases), multi-image frame extraction, and the
  * None-never-garbage rejection scope. */
class GifCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: Int => Int): PngCodec.PngImage =
    PngCodec.PngImage(w, h, 1, Array.tabulate(w * h)(i => f(i).toByte))

  private def rgbOf(img: PngCodec.PngImage): Array[Byte] = {
    require(img.channels == 1)
    img.pixels.flatMap(b => Array(b, b, b))
  }

  test("grayscale round-trips byte-exactly (identity palette, every value)") {
    for ((w, h, seed) <- Seq((16, 16, 1), (24, 16, 7), (19, 13, 42), (1, 1, 0))) {
      val img = gray(w, h, i => (seed * 37 + i * 29) % 256)
      val bytes = GifCodec.encode(img).get
      assert(GifCodec.isGif(bytes))
      val d = GifCodec.decode(bytes)
      assert(d.isDefined, s"decode failed ${w}x$h seed=$seed")
      assert(d.get.width == w && d.get.height == h && d.get.channels == 3)
      assert(java.util.Arrays.equals(d.get.pixels, rgbOf(img)),
        s"round-trip not byte-exact ${w}x$h seed=$seed")
    }
  }

  test("interlaced encode decodes to the SAME pixels (4-pass row order)") {
    for ((w, h) <- Seq((16, 16), (21, 17), (8, 11), (5, 3), (7, 1), (1, 9))) {
      val img = gray(w, h, i => (i * 29 + 3) % 256)
      val seq = GifCodec.decode(GifCodec.encode(img, interlace = false).get).get
      val int = GifCodec.decode(GifCodec.encode(img, interlace = true).get).get
      assert(java.util.Arrays.equals(seq.pixels, int.pixels),
        s"interlaced decode diverges at ${w}x$h")
    }
  }

  test("KwKwK + dictionary-growth stress: runs and repeats round-trip exactly") {
    // aaaa... maximizes the KwKwK (code == dictSize) path; the ramp
    // pushes the dictionary through several code-width boundaries
    val runs = gray(64, 64, _ => 7)
    val ramp = gray(64, 64, i => (i / 3) % 256)
    val mix = gray(64, 64, i => if ((i / 64) % 2 == 0) 9 else (i * 13) % 256)
    Seq(runs, ramp, mix).foreach { img =>
      val d = GifCodec.decode(GifCodec.encode(img).get).get
      assert(java.util.Arrays.equals(d.pixels, rgbOf(img)))
    }
  }

  test("large image crosses the 12-bit dictionary freeze and still round-trips") {
    // 256x256 of near-noise fills the 4096-entry dictionary (deferred
    // clear: FROZEN, never reset) — the sync-critical path
    val img = gray(256, 256, i => (i * 2654435761L % 251).toInt)
    val d = GifCodec.decode(GifCodec.encode(img).get).get
    assert(java.util.Arrays.equals(d.pixels, rgbOf(img)))
  }

  test("RGB with <= 256 distinct colors round-trips; > 256 colors refuses") {
    val w = 20; val h = 20
    val px = Array.tabulate(w * h * 3) { j =>
      val i = j / 3
      (Seq(10, 200, 77)(j % 3) + (i % 13)).toByte // 13 distinct colors
    }
    val img = PngCodec.PngImage(w, h, 3, px)
    val d = GifCodec.decode(GifCodec.encode(img).get).get
    assert(java.util.Arrays.equals(d.pixels, px))
    // 1024 genuinely distinct colors: (low byte, high bits, 0) of the index
    val many = PngCodec.PngImage(32, 32, 3,
      Array.tabulate(32 * 32 * 3) { j =>
        val i = j / 3
        (j % 3 match {
          case 0 => i & 0xff
          case 1 => (i >> 8) & 0xff
          case _ => 0
        }).toByte
      })
    assert(GifCodec.encode(many).isEmpty, "1024-color image must refuse")
  }

  test("multi-image stream surfaces every frame; decode takes the first") {
    val a = gray(8, 8, i => i % 256)
    val b = gray(16, 8, i => (i * 3) % 256)
    val ba = GifCodec.encode(a).get
    val bb = GifCodec.encode(b).get
    // splice b's image block (descriptor..data terminator) before a's trailer
    val bodyStart = 6 + 7 + 768 // header + LSD + GCT
    val spliced = ba.dropRight(1) ++
      bb.slice(bodyStart, bb.length - 1) :+ 0x3b.toByte
    val fs = GifCodec.frames(spliced.toArray)
    assert(fs.isDefined && fs.get.size == 2)
    assert(java.util.Arrays.equals(fs.get.head.pixels, rgbOf(a)))
    assert(java.util.Arrays.equals(fs.get(1).pixels, rgbOf(b)))
    assert(java.util.Arrays.equals(
      GifCodec.decode(spliced.toArray).get.pixels, rgbOf(a)))
  }

  test("extension blocks (GCE / comment / application) are skipped cleanly") {
    val img = gray(8, 8, i => i)
    val b = GifCodec.encode(img).get
    val bodyStart = 6 + 7 + 768
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val comment = Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)
    val withExt = (b.take(bodyStart) ++ gce ++ comment ++ b.drop(bodyStart))
    val d = GifCodec.decode(withExt)
    assert(d.isDefined && java.util.Arrays.equals(d.get.pixels, rgbOf(img)))
  }

  test("rejection scope: corrupt/truncated/hostile streams return None, never garbage") {
    val good = GifCodec.encode(gray(16, 16, i => i % 256)).get
    assert(GifCodec.decode("GIF89a".getBytes ++ Array[Byte](1, 2)).isEmpty)
    assert(GifCodec.decode(good.take(good.length / 2)).isEmpty,
      "truncated mid-data must be None")
    assert(GifCodec.decode(good.dropRight(1)).isEmpty,
      "missing trailer must be None")
    assert(GifCodec.decode("NOTGIF".getBytes ++ good.drop(6)).isEmpty)
    // header-declared huge dims must refuse BEFORE allocating
    val huge = good.clone()
    huge(6) = 0xff.toByte; huge(7) = 0xff.toByte
    huge(8) = 0xff.toByte; huge(9) = 0xff.toByte
    assert(GifCodec.decode(huge).isEmpty)
    // LZW garbage: stomp the data bytes — must not throw
    val bad = good.clone()
    for (i <- good.length - 24 until good.length - 2) bad(i) = 0x5a
    GifCodec.decode(bad) // may be None or a decode; must terminate cleanly
  }

  test("gifFromDocuments fixture: decoded stats equal the generating formula") {
    // the q234 oracle's arithmetic, checked here without Spark: one id
    // per (w, h, interlace) combination
    for (id <- 0L to 11L) {
      val w = 16 + (id % 3) * 8; val h = 16 + (id % 2) * 8
      val px = Array.tabulate((w * h).toInt)(i => ((id * 37 + i * 29) % 256).toByte)
      val img = PngCodec.PngImage(w.toInt, h.toInt, 1, px)
      val d = GifCodec.decode(GifCodec.encode(img, interlace = id % 4 == 0).get).get
      val sum = d.pixels.map(b => (b & 0xff).toLong).sum
      val want = 3L * (0 until (w * h).toInt).map(i => (id * 37 + i * 29) % 256).sum
      assert(sum == want, s"id=$id")
    }
  }
}
