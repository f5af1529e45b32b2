package graft.multimodal

/** GIF89a codec — JDK-only, from the public GIF89a specification (CompuServe
  * 1990; the format's LZW variant is also specified in the reference's
  * public domain: variable-width codes 3..12 bits, LSB-first packing,
  * CLEAR/EOI control codes, 4096-entry dictionary).
  *
  * Decode scope (the [[JpegCodec]] contract — decode-or-loud-None, never
  * garbage): GIF87a/GIF89a signatures, global + local color tables,
  * interlaced and sequential image data, multi-image streams (each image
  * descriptor surfaces as one RGB frame at ITS OWN dims — logical-screen
  * compositing/disposal is deliberately out of scope and documented, the
  * decode queries use single-image streams), extension blocks skipped by
  * length (graphic control, comment, application/NETSCAPE). Rejected with
  * None: bad signature, truncated blocks, missing color table, palette
  * overruns, LZW code-stream violations, header-declared allocations past
  * the same 1e8-px/plane cap as [[JpegCodec]].
  *
  * Encode scope: channels=1 (identity 256-gray palette) or channels=3
  * with ≤ 256 distinct colors (first-appearance palette order), optional
  * interlace, always GIF89a + a 256-entry GCT + one image block. GIF is
  * LOSSLESS, so encode→decode round-trips BYTE-EXACTLY (GifCodecSpec) —
  * which is what lets the q234 gate oracle decoded statistics from a
  * per-pixel generating formula with no flat-block constraint (contrast
  * q206's lossy-JPEG construction). */
object GifCodec {
  import PngCodec.PngImage

  /** Same header-declared allocation cap as JpegCodec: dims are attacker-
    * controlled metadata; nothing allocates past this. */
  private val MaxPixels = 100000000L
  private val MaxDict = 4096

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) // GIF is little-endian

  /** First frame as RGB. */
  def decode(bytes: Array[Byte]): Option[PngImage] =
    frames(bytes).flatMap(_.headOption)

  /** Every image block as an independent RGB frame (no compositing). */
  def frames(bytes: Array[Byte]): Option[Seq[PngImage]] = {
    if (!isGif(bytes) || bytes.length < 13) return None
    val sw = u16(bytes, 6); val sh = u16(bytes, 8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return None
    val packed = bytes(10) & 0xff
    var off = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (off + 3 * n > bytes.length) return None
      gct = readPalette(bytes, off, n)
      off += 3 * n
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[PngImage]
    while (off < bytes.length) {
      (bytes(off) & 0xff) match {
        case 0x3b => return if (out.isEmpty) None else Some(out.toSeq)
        case 0x21 => // extension: label byte + length-prefixed sub-blocks
          off += 2
          if (off >= bytes.length) return None
          while (off < bytes.length && bytes(off) != 0) {
            off += 1 + (bytes(off) & 0xff)
            if (off > bytes.length) return None
          }
          if (off >= bytes.length) return None
          off += 1 // block terminator
        case 0x2c =>
          if (off + 10 > bytes.length) return None
          val iw = u16(bytes, off + 5); val ih = u16(bytes, off + 7)
          val ip = bytes(off + 9) & 0xff
          off += 10
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > MaxPixels) return None
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (off + 3 * n > bytes.length) return None
            pal = readPalette(bytes, off, n)
            off += 3 * n
          }
          if (pal == null) return None // no color table anywhere
          if (off >= bytes.length) return None
          val minCode = bytes(off) & 0xff
          off += 1
          // concatenate the image's length-prefixed data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (off < bytes.length && bytes(off) != 0) {
            val n = bytes(off) & 0xff
            if (off + 1 + n > bytes.length) return None
            data.write(bytes, off + 1, n)
            off += 1 + n
          }
          if (off >= bytes.length) return None
          off += 1 // terminator
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          if (idx.length < iw * ih) return None
          val px = new Array[Byte](iw * ih * 3)
          var i = 0
          while (i < iw * ih) {
            val v = idx(i) & 0xff
            if (v >= pal.length) return None
            val c = pal(v)
            val base = if ((ip & 0x40) != 0) deinterlacedBase(i, iw, ih)
              else i * 3
            px(base) = ((c >> 16) & 0xff).toByte
            px(base + 1) = ((c >> 8) & 0xff).toByte
            px(base + 2) = (c & 0xff).toByte
            i += 1
          }
          out += PngImage(iw, ih, 3, px)
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  private def readPalette(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((b(off + 3 * i) & 0xff) << 16) |
      ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff))

  /** Destination byte offset for source row-sequence index `i` under the
    * GIF 4-pass interlace (rows 0,8,16.. then 4,12.. then 2,6.. then
    * 1,3,5..). */
  private def deinterlacedBase(i: Int, w: Int, h: Int): Int = {
    val row = i / w; val colx = i % w
    val p1 = (h + 7) / 8          // pass 1 rows: 0, 8, ...
    val p2 = (h + 3) / 8          // pass 2 rows: 4, 12, ...
    val p3 = (h + 1) / 4          // pass 3 rows: 2, 6, ...
    val destRow =
      if (row < p1) row * 8
      else if (row < p1 + p2) 4 + (row - p1) * 8
      else if (row < p1 + p2 + p3) 2 + (row - p1 - p2) * 4
      else 1 + (row - p1 - p2 - p3) * 2
    (destRow * w + colx) * 3
  }

  /** GIF-variant LZW: variable code width minCode+1 .. 12 bits, LSB-first,
    * CLEAR resets the dictionary, EOI ends the stream; the dictionary
    * FREEZES at 4096 entries until the next CLEAR (deferred-clear form).
    * Returns None on any code-stream violation or when the stream would
    * overrun `maxPixels` (allocation guard). */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      maxPixels: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode; val eoi = clear + 1
    var codeSize = minCode + 1
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Byte](MaxDict)
    val lenOf = new Array[Int](MaxDict)
    var dictSize = eoi + 1
    var i = 0
    while (i < clear) { suffix(i) = i.toByte; lenOf(i) = 1; prefix(i) = -1; i += 1 }
    val out = new Array[Byte](maxPixels)
    var outLen = 0
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    def readCode(): Int = {
      if (bitPos + codeSize > totalBits) -1
      else {
        var v = 0; var k = 0
        while (k < codeSize) {
          val p = bitPos + k
          if (((data((p >> 3).toInt) >> (p & 7).toInt) & 1) != 0) v |= 1 << k
          k += 1
        }
        bitPos += codeSize
        v
      }
    }
    // write the expansion of `code` at out(outLen); returns first byte
    def emit(code: Int): Int = {
      val l = lenOf(code)
      if (outLen + l > maxPixels) return -1
      var c = code; var p = outLen + l - 1
      while (c >= 0) { out(p) = suffix(c); p -= 1; c = prefix(c) }
      outLen += l
      out(outLen - l) & 0xff
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0) return None // truncated before EOI
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first data code must be a literal
        if (emit(code) < 0) return None
        prev = code
      } else {
        var first = -1
        if (code < dictSize && code != eoi) first = {
          if (code == clear) return None
          emit(code)
        }
        else if (code == dictSize && dictSize < MaxDict) {
          // the KwKwK case: entry = prev's expansion + its first byte
          val l = lenOf(prev)
          if (outLen + l + 1 > maxPixels) return None
          var c = prev; var p = outLen + l - 1
          while (c >= 0) { out(p) = suffix(c); p -= 1; c = prefix(c) }
          out(outLen + l) = out(outLen)
          first = out(outLen) & 0xff
          outLen += l + 1
        } else return None
        if (first < 0) return None
        if (dictSize < MaxDict) {
          prefix(dictSize) = prev; suffix(dictSize) = first.toByte
          lenOf(dictSize) = lenOf(prev) + 1
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(java.util.Arrays.copyOf(out, outLen))
  }

  // ── encoder ──────────────────────────────────────────────────────────

  /** Encode to a single-image GIF89a. Grayscale (channels=1) uses the
    * identity 256-gray palette; RGB needs ≤ 256 distinct colors
    * (first-appearance palette order). None when the image is un-palettable. */
  def encode(img: PngImage, interlace: Boolean = false): Option[Array[Byte]] = {
    if (img.width <= 0 || img.height <= 0) return None
    val n = img.width * img.height
    val (palette, indices): (Array[Int], Array[Byte]) = img.channels match {
      case 1 =>
        (Array.tabulate(256)(v => (v << 16) | (v << 8) | v), img.pixels.clone())
      case 3 =>
        val colorToIdx = new java.util.HashMap[Integer, Integer]()
        val pal = scala.collection.mutable.ArrayBuffer.empty[Int]
        val idx = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val c = ((img.pixels(3 * i) & 0xff) << 16) |
            ((img.pixels(3 * i + 1) & 0xff) << 8) | (img.pixels(3 * i + 2) & 0xff)
          var j = colorToIdx.getOrDefault(c, -1)
          if (j < 0) {
            if (pal.size == 256) return None
            j = pal.size; pal += c; colorToIdx.put(c, j)
          }
          idx(i) = j.toByte
          i += 1
        }
        (pal.toArray.padTo(256, 0), idx)
      case _ => return None
    }
    val ordered =
      if (!interlace) indices
      else { // emit rows in interlace order
        val o = new Array[Byte](n)
        var si = 0
        Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
          var r = start
          while (r < img.height) {
            System.arraycopy(indices, r * img.width, o, si, img.width)
            si += img.width; r += step
          }
        }
        o
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(img.width); w16(img.height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // bg index, aspect
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c); w16(0); w16(0); w16(img.width); w16(img.height)
    out.write(if (interlace) 0x40 else 0x00)
    val minCode = 8
    out.write(minCode)
    val lzw = lzwEncode(ordered, minCode)
    var p = 0
    while (p < lzw.length) {
      val chunk = math.min(255, lzw.length - p)
      out.write(chunk)
      out.write(lzw, p, chunk)
      p += chunk
    }
    out.write(0)    // data terminator
    out.write(0x3b) // trailer
    Some(out.toByteArray)
  }

  /** GIF-variant LZW compressor (CLEAR first, EOI last, dictionary frozen
    * at 4096 — mirrors [[lzwDecode]]'s deferred-clear contract). */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    var codeSize = minCode + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var nBits = 0
    def put(code: Int): Unit = {
      cur |= code << nBits; nBits += codeSize
      while (nBits >= 8) { out.write(cur & 0xff); cur >>>= 8; nBits -= 8 }
    }
    put(clear)
    if (indices.nonEmpty) {
      var prev: Int = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val b = indices(i) & 0xff
        val key = (prev << 8) | b
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) prev = hit
        else {
          put(prev)
          if (nextCode < MaxDict) {
            dict.put(key, nextCode)
            nextCode += 1
            // decoder grows its dict ONE code behind; it bumps codeSize
            // when ITS dictSize (= nextCode - 1 here) fills the width
            if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = b
        }
        i += 1
      }
      put(prev)
    }
    put(eoi)
    if (nBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }
}
