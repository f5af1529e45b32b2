package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** EXIF orientation normalization (q255): the D4 transform algebra, the
  * fixture's inverse-storage premise, pHash invariance under stored
  * orientation, and the negative control (skipping the transform MUST
  * change the hash — otherwise the q255 gate has no teeth). */
class OrientationSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, seed: Int): PngCodec.PngImage =
    PngCodec.PngImage(w, h, 1,
      Array.tabulate(w * h)(i => ((seed * 31 + i * 7) % 256).toByte))

  test("orientApply(orientApply(u, exifInverse(o)), o) == u for all 8") {
    val u = img(24, 16, 5)
    (1 to 8).foreach { o =>
      val back = Multimodal.orientApply(
        Multimodal.orientApply(u, Multimodal.exifInverse(o)), o)
      assert(back.width == u.width && back.height == u.height)
      assert(back.pixels.toSeq == u.pixels.toSeq, s"orientation $o")
    }
  }

  test("rotations compose: 90CW twice == 180; transpose of transpose == id") {
    val u = img(24, 16, 9)
    val r90twice = Multimodal.orientApply(Multimodal.orientApply(u, 6), 6)
    val r180 = Multimodal.orientApply(u, 3)
    assert(r90twice.pixels.toSeq == r180.pixels.toSeq)
    val t2 = Multimodal.orientApply(Multimodal.orientApply(u, 5), 5)
    assert(t2.pixels.toSeq == u.pixels.toSeq)
  }

  test("pHash is invariant under stored orientation; skipping the " +
    "transform changes it (gate teeth)") {
    // non-symmetric content so every D4 element actually moves pixels
    val u = img(24, 16, 13)
    val upright = Multimodal.phashOf(u)
    var skippedDiffers = 0
    (2 to 8).foreach { o =>
      val stored = Multimodal.orientApply(u, Multimodal.exifInverse(o))
      assert(Multimodal.phashOf(Multimodal.orientApply(stored, o)) == upright,
        s"normalized pHash drifted for orientation $o")
      if (Multimodal.phashOf(stored) != upright) skippedDiffers += 1
    }
    assert(skippedDiffers >= 5,
      s"skipping the transform should change most hashes ($skippedDiffers/7)")
  }

  test("q259 claim: a metadata-free rotated/mirrored duplicate shares the " +
    "canonical min-over-D4 hash (the 8-hash SET is D4-invariant)") {
    val u = img(24, 16, 21)
    def hashes(im: PngCodec.PngImage): Seq[Long] =
      (1 to 8).map(o => Multimodal.phashOf(Multimodal.orientApply(im, o)))
    val base = hashes(u)
    (2 to 8).foreach { o =>
      val dup = Multimodal.orientApply(u, o) // a no-EXIF rotated duplicate
      val hs = hashes(dup)
      assert(hs.toSet == base.toSet,
        s"orientation $o duplicate lost the D4 hash set")
      assert(hs.min == base.min, s"canonical key drifted for orientation $o")
    }
    // and a genuinely different image does NOT collide
    val other = img(24, 16, 22)
    assert(hashes(other).min != base.min)
  }

  test("q255 fixture premise: JPEG round-trip of the inverse-oriented " +
    "flat-block raster is bit-exact and EXIF arms resolve") {
    val ids = Seq(0L, 1L, 4L, 5L, 7L, 10L, 15L)
    ids.foreach { id =>
      val malformed = id % 5 == 0
      val o = if (malformed) 1 else (1 + id % 8).toInt
      // rebuild exactly what jpegOrientedCorpus stores
      val upright = {
        val w = (16 + (id % 3) * 8).toInt; val h = (16 + (id % 2) * 8).toInt
        PngCodec.PngImage(w, h, 1, Array.tabulate(w * h) { i =>
          val bx = (i % w) / 8; val by = (i / w) / 8
          ((id * 37 + (by * (w / 8) + bx) * 29) % 256).toByte
        })
      }
      val raster = Multimodal.orientApply(upright, Multimodal.exifInverse(o))
      val bytes = JpegCodec.insertApp1(JpegCodec.encode(raster, quant = 1),
        if (malformed) JpegCodec.exifApp1Malformed
        else JpegCodec.exifApp1(o, "2026:01:15 12:00:00"))
      val decoded = JpegCodec.decode(bytes).get
      assert(decoded.pixels.toSeq == raster.pixels.toSeq,
        s"id $id: flat-block bit-exactness must survive the D4 permutation")
      val ex = JpegCodec.parseExif(bytes)
      if (malformed) assert(ex.isEmpty)
      else assert(ex.map(_._1).contains(o))
      assert(Multimodal.phashOf(Multimodal.orientApply(decoded,
        ex.map(_._1).getOrElse(1))) == Multimodal.phashOf(upright))
    }
  }
}
