package graft.multimodal

/** REAL header-level metadata decode for the two most common media
  * containers — pure byte arithmetic over the public file-format layouts,
  * no codec libraries:
  *
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk
  *    whose payload starts at offset 16 with width and height as 4-byte
  *    BIG-ENDIAN unsigned ints (PNG spec §5.2/§11.2.2).
  *  - WAV: RIFF container — `RIFF....WAVE`, then chunks; the `fmt ` chunk
  *    carries channels (u16 LE @ +2), sample rate (u32 LE @ +4) and
  *    byte rate (u32 LE @ +8); the `data` chunk length over the byte rate
  *    gives duration (RIFF/WAVE spec). Chunks are walked, not assumed at
  *    fixed offsets — writers emit LIST/fact chunks before data.
  *
  * Pixel/sample decode lives in [[PngCodec]]/[[WavCodec]] (also JDK-only);
  * this object stays the cheap metadata-only path — the half a lakehouse
  * query actually touches — spec-pinned against hand-built byte-exact
  * fixtures (MultimodalSpec). Malformed or truncated headers return None
  * and the caller degrades to header-less metadata: ingest never crashes
  * on a corrupt payload (the CorpusIO audit philosophy).
  */
object HeaderCodec {

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && PngMagic.indices.forall(i => b(i) == PngMagic(i))

  /** PNG width/height from the IHDR chunk. None unless the signature,
    * chunk length (13) and chunk type all check out — a malformed header
    * must not yield garbage dimensions. */
  def parsePng(b: Array[Byte]): Option[(Int, Int)] = {
    if (!isPng(b) || b.length < 24) return None
    // bytes 8-11: IHDR payload length (must be 13); 12-15: "IHDR"
    if (u32be(b, 8) != 13L) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = u32be(b, 16)
    val h = u32be(b, 20)
    // spec: zero is invalid; 2^31-1 is the max
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt))
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  final case class WavMeta(channels: Int, sampleRate: Int, byteRate: Int,
      dataBytes: Long, durationMs: Long)

  /** Walk RIFF chunks for `fmt ` + `data`. Tolerates extra chunks (LIST,
    * fact) in any order before them; None on truncation or a zero byte
    * rate (division guard). */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (!isWav(b)) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, sampleRate, byteRate
    var dataLen = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val id = new String(b.slice(off, off + 4), "US-ASCII")
      val len = u32le(b, off + 4)
      if (id == "fmt " && off + 8 + 16 <= b.length)
        fmt = Some((u16le(b, off + 10), u32le(b, off + 12).toInt,
          u32le(b, off + 16).toInt))
      else if (id == "data")
        // the data payload may legitimately be truncated in a sampled
        // ingest; the declared length is still the duration source
        dataLen = len
      // chunks are word-aligned: odd lengths carry a pad byte
      off += 8 + len.toInt + (len.toInt & 1)
    }
    for ((ch, sr, br) <- fmt if dataLen >= 0 && br > 0)
      yield WavMeta(ch, sr, br, dataLen, dataLen * 1000L / br)
  }

  /** Real-header decode: Some(meta) when a known container parses, None
    * otherwise (caller falls back to the stub codec). JPEG dims come from
    * [[JpegCodec.parseHeader]]'s SOF0 walk (baseline streams only — the
    * same scope as the pixel decoder, so metadata never claims dims the
    * codec layer could not honor). */
  def decode(kind: String, bytes: Array[Byte]): Option[Multimodal.MediaMeta] =
    parsePng(bytes).map { case (w, h) =>
      Multimodal.MediaMeta(kind, "png", bytes.length.toLong, w, h, 0L)
    }.orElse(parseWav(bytes).map { wm =>
      Multimodal.MediaMeta(kind, "wav", bytes.length.toLong, 0, 0, wm.durationMs)
    }).orElse(JpegCodec.parseHeader(bytes).map { case (w, h, _) =>
      Multimodal.MediaMeta(kind, "jpeg", bytes.length.toLong, w, h, 0L)
    })
}
