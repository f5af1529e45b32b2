package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators implemented as partition-batched transforms.
  *
  * The codec layer is REAL as of round 7 — no stubs: PNG pixels decode via
  * `java.util.zip.Inflater` + per-scanline unfiltering and WAV PCM samples
  * via byte arithmetic ([[PngCodec]]/[[WavCodec]], JDK-only), "video" is a
  * motion-PNG stream (concatenated PNG frames) split on the signature, and
  * every derived statistic comes from decoded pixels/samples. q103 gates
  * this end-to-end: payloads are ENCODED from a deterministic formula,
  * decoded back, and the decoded statistics hash-compared against DuckDB
  * computing the same statistics from the formula — fabricated decode
  * output cannot pass. Containers outside the documented codec scope
  * degrade to header-only metadata (None-driven, never garbage) so ingest
  * never crashes on an undecodable payload.
  *
  * Scale design: media bytes never shuffle. Every operator is a narrow
  * `mapPartitions` over the (id, content) pairs with per-partition batch
  * amortization — at 100 TB the binary column stays columnar-compressed in
  * Parquet, is read only by operators that need it (column pruning), and
  * derived features (small) are what flows into joins/aggregations.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      kind: String,      // image | audio | video
      format: String,    // png | wav | png-seq | bin (sniffed from bytes)
      nBytes: Long,
      width: Int,        // 0 when not applicable
      height: Int,
      durationMs: Long)  // 0 for still images

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, meta: MediaMeta, features: Array[Float])

  /** Decoded-payload statistics — the q103 gate row. Integer sums over
    * pixels/samples stay exact BIGINTs so the oracle compare is bit-exact. */
  final case class MediaStats(media_id: Long, kind: String, format: String,
      n_units: Long, unit_sum: Long, unit_sumsq: Long,
      width: Long, height: Long, duration_ms: Long)

  /** One fixed-length energy window over a decoded PCM clip — the q156
    * gate row. Exact integer squared-energy sums; `active` is an exact
    * integer threshold compare (no float knife edge). */
  final case class AudioWindow(media_id: Long, window_id: Long, len: Long,
      sq_sum: Long, active: Long)

  /** One patch of a decoded image — the q157 gate row. pw/ph are the
    * actual patch dims (edge patches are clipped, never padded); sums
    * run over every channel byte in the patch, exact BIGINTs. */
  final case class ImagePatch(media_id: Long, patch_row: Long,
      patch_col: Long, pw: Long, ph: Long, px_sum: Long, px_sumsq: Long)

  /** Motion between one consecutive frame pair of a decoded video — the
    * q159 gate row. abs_diff_sum is the exact integer sum of per-pixel
    * absolute differences (the L1 motion energy); n_px the compared
    * pixel count. */
  /** Perceptual average-hash of a decoded image — the q170 gate row. The
    * 64-bit fingerprint is brightness-scale tolerant (bits encode
    * relative position vs the image mean) and byte-exact reproducible. */
  final case class ImageHash(media_id: Long, ahash: Long)

  final case class FrameMotion(media_id: Long, frame_from: Long,
      frame_to: Long, n_px: Long, abs_diff_sum: Long)

  /** Nominal frame period for the motion-PNG "video" container: the
    * stream carries no timing metadata, so duration is frames x 40 ms
    * (25 fps), documented rather than fabricated per-payload. */
  private val VideoFrameMs = 40L

  /** Still-image decode across the supported raster containers: PNG
    * first (signature-dispatched), then baseline JPEG. One shared entry
    * so every image operator (stats, patches, aHash, resize) accepts
    * both formats with identical downstream arithmetic. */
  def decodeImage(bytes: Array[Byte]): Option[PngCodec.PngImage] =
    if (HeaderCodec.isPng(bytes)) PngCodec.decode(bytes)
    else if (GifCodec.isGif(bytes)) GifCodec.decode(bytes)
    else JpegCodec.decode(bytes)

  /** Split a motion-PNG stream into its PNG frames (signature-delimited).
    * A single PNG yields one frame; non-PNG bytes yield none. */
  def splitFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def isSigAt(off: Int): Boolean =
      off + 8 <= bytes.length && sig.indices.forall(i => bytes(off + i) == sig(i))
    val starts = (0 to bytes.length - 8).filter(isSigAt)
    starts.zipAll(starts.drop(1), -1, bytes.length).collect {
      case (s, e) if s >= 0 => java.util.Arrays.copyOfRange(bytes, s, e)
    }
  }

  /** Real codec dispatch — every branch decodes actual payload bytes. */
  object Codec {

    /** Container metadata from a real parse; header-only fallback for
      * out-of-scope formats (format sniff + byte count, zero dims). */
    def decode(kind: String, bytes: Array[Byte]): MediaMeta =
      HeaderCodec.decode(kind, bytes) match {
        case Some(m) if m.format == "png" && kind == "video" =>
          // motion-PNG: dims from frame 1, duration from the frame count
          m.copy(format = "png-seq",
            durationMs = splitFrames(bytes).size * VideoFrameMs)
        case Some(m) => m
        case None => MediaMeta(kind, "bin", bytes.length.toLong, 0, 0, 0L)
      }

    /** 8 floats from DECODED pixels/samples.
      * image / video: [meanLuma, meanC0..C3, width, height, channels]
      *   (video: means pooled over all frames, width/height of frame 1,
      *    slot 4 = frame count instead of meanC3);
      * audio: [rms, mean, peak, zeroCrossRate, sampleRate, channels,
      *   nSamples, durationMs];
      * undecodable: all zeros (honest absence, not a hash-derived fake). */
    def extractFeatures(kind: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      if (kind == "audio") {
        WavCodec.decode(bytes).foreach { case (meta, samples) =>
          var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
          var i = 0
          while (i < samples.length) {
            val v = samples(i).toDouble
            sum += v; sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && (samples(i) < 0) != (samples(i - 1) < 0)) zc += 1
            i += 1
          }
          val n = math.max(samples.length, 1)
          out(0) = math.sqrt(sumSq / n).toFloat
          out(1) = (sum / n).toFloat
          out(2) = peak.toFloat
          out(3) = zc.toFloat / n
          out(4) = meta.sampleRate.toFloat
          out(5) = meta.channels.toFloat
          out(6) = samples.length.toFloat
          out(7) = meta.durationMs.toFloat
        }
      } else {
        val pngFrames = splitFrames(bytes).flatMap(PngCodec.decode)
        val frames =
          if (pngFrames.nonEmpty) pngFrames
          else JpegCodec.decode(bytes).toSeq
        if (frames.nonEmpty) {
          val ch = frames.head.channels
          val chSum = new Array[Double](4)
          var lumaSum = 0.0; var nPx = 0L
          frames.foreach { img =>
            val px = img.pixels
            val n = img.width * img.height
            var p = 0
            while (p < n) {
              var c = 0
              while (c < ch) { chSum(c) += px(p * ch + c) & 0xff; c += 1 }
              val luma = ch match {
                case 1 | 2 => (px(p * ch) & 0xff).toDouble
                case _ => 0.299 * (px(p * ch) & 0xff) +
                  0.587 * (px(p * ch + 1) & 0xff) + 0.114 * (px(p * ch + 2) & 0xff)
              }
              lumaSum += luma
              p += 1
            }
            nPx += n
          }
          out(0) = (lumaSum / nPx).toFloat
          var c = 0
          while (c < math.min(ch, 3)) { out(1 + c) = (chSum(c) / nPx).toFloat; c += 1 }
          out(4) = if (kind == "video") frames.size.toFloat
            else if (ch == 4) (chSum(3) / nPx).toFloat else 0f
          out(5) = frames.head.width.toFloat
          out(6) = frames.head.height.toFloat
          out(7) = ch.toFloat
        }
      }
      out
    }
  }

  /** Decode + feature-extract, batched per partition. The imperative loop
    * touches each payload exactly once per partition; no bytes cross the
    * shuffle boundary. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, Codec.decode(r.kind, r.content),
          Codec.extractFeatures(r.kind, r.content))
      }
    }
  }

  /** Resize on REAL pixels: PNG payloads are decoded, nearest-neighbor
    * resampled and re-encoded; motion-PNG streams resize frame-by-frame;
    * non-image (or undecodable) payloads pass through unchanged. */
  def resized(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val png = splitFrames(r.content).flatMap(f =>
        PngCodec.decode(f).map(img => PngCodec.encode(PngCodec.resize(img, w, h))))
      // JPEG stills transcode to PNG on the way out: resize re-encode is
      // lossless-container by policy (a resample through a lossy encoder
      // would compound generation loss)
      val out =
        if (png.nonEmpty) png
        else JpegCodec.decode(r.content)
          .map(img => PngCodec.encode(PngCodec.resize(img, w, h))).toSeq
      if (out.isEmpty) r else r.copy(content = out.flatten.toArray)
    })
  }

  /** Frame sampling: up to `frames` evenly-strided stills from a
    * motion-PNG stream (one row per sampled frame). */
  def sampledFrames(media: Dataset[MediaRow], frames: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val fs = splitFrames(r.content)
      val picked =
        if (fs.size <= frames) fs
        else (0 until frames).map(i => fs((i.toLong * fs.size / frames).toInt))
      picked.zipWithIndex.map { case (f, i) =>
        MediaRow(r.media_id * 1000 + i, "image", f)
      }
    }
  }

  // ── Deterministic payload synthesis (the q103 oracle contract) ───────
  // Real containers built from closed-form byte patterns so DuckDB can
  // reproduce every decoded statistic from the formula alone:
  //   image (id%3==0): 8-bit gray PNG, w=8+id%9, h=8+id%7,
  //     pix(i) = (id*31 + i*7) % 256, filter type id%5 (all five PNG
  //     filters exercised across the corpus);
  //   audio (id%3==1): PCM16 mono WAV @8000 Hz, n=256+id%128,
  //     s(i) = (id*13 + i*5) % 2001 - 1000;
  //   video (id%3==2): 3 gray PNG frames, pix(f,i) = (id*31+f*97+i*7)%256.

  private def imageDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + id % 7).toInt)

  private def buildPayload(id: Long): (String, Array[Byte]) = (id % 3) match {
    case 0 =>
      val (w, h) = imageDims(id)
      val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toByte)
      ("image", PngCodec.encode(PngCodec.PngImage(w, h, 1, px), (id % 5).toInt))
    case 1 =>
      val n = (256 + id % 128).toInt
      val s = Array.tabulate(n)(i => ((id * 13 + i * 5) % 2001 - 1000).toShort)
      ("audio", WavCodec.encode(s, 8000))
    case _ =>
      val (w, h) = imageDims(id)
      val frames = (0 until 3).map { f =>
        val px = Array.tabulate(w * h)(i => ((id * 31 + f * 97 + i * 7) % 256).toByte)
        PngCodec.encode(PngCodec.PngImage(w, h, 1, px), (id % 5).toInt)
      }
      ("video", frames.flatten.toArray)
  }

  /** Media table over the documents corpus ids: REAL PNG/WAV/motion-PNG
    * payloads from the deterministic formulas above — every codec path is
    * exercisable on driver testdata with an exact DuckDB oracle. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (kind, bytes) = buildPayload(id)
        MediaRow(id, kind, bytes)
      })
  }

  // ── JPEG fixture corpus (the q206 oracle contract) ───────────────────
  // Real baseline JFIF streams whose decode is BIT-EXACT despite the
  // lossy format: every image is built from FLAT 8x8 blocks (constant
  // value per block), so the DCT has a single integer DC coefficient and
  // zero AC per block, and with the quant=1 tables the decoder's
  // huffman→dequant→IDCT chain reproduces each pixel exactly — which is
  // what lets DuckDB oracle the decoded statistics from the closed form:
  //   w = 16 + (id%3)*8, h = 16 + (id%2)*8  (2..4 x 2..3 blocks)
  //   block b (row-major over the block grid): value (id*37 + b*29) % 256.

  private def jpegDims(id: Long): (Int, Int) =
    ((16 + (id % 3) * 8).toInt, (16 + (id % 2) * 8).toInt)

  private def jpegPixels(id: Long): PngCodec.PngImage = {
    val (w, h) = jpegDims(id)
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val bx = (i % w) / 8; val by = (i / w) / 8
      px(i) = ((id * 37 + (by * (w / 8) + bx) * 29) % 256).toByte
      i += 1
    }
    PngCodec.PngImage(w, h, 1, px)
  }

  private def buildJpegPayload(id: Long): Array[Byte] =
    JpegCodec.encode(jpegPixels(id), quant = 1)

  // ── GIF fixture corpus (the q234 oracle contract) ────────────────────
  // GIF is LOSSLESS, so unlike the JPEG fixtures no flat-block
  // construction is needed: every PIXEL carries its own formula value
  //   w = 16 + (id%3)*8, h = 16 + (id%2)*8, pixel i: (id*37 + i*29) % 256
  // encoded through the identity 256-gray palette (r=g=b=v), LZW and all,
  // and the decoder must reproduce each RGB byte exactly for the stats to
  // match DuckDB evaluating the same closed form. Per-pixel (not
  // per-block) values also exercise LZW's dictionary growth through every
  // code width, which a flat fixture would not.

  /** GIF89a media table over the documents corpus ids — the q234 gate
    * input (real LZW streams; one interlaced in four via id % 4 == 0 so
    * the 4-pass row order sits under the same gate). */
  def gifFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = jpegDims(id) // the shared dims formula
        val px = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { px(i) = ((id * 37 + i * 29) % 256).toByte; i += 1 }
        val img = PngCodec.PngImage(w, h, 1, px)
        MediaRow(id, "image",
          GifCodec.encode(img, interlace = id % 4 == 0).get)
      })
  }

  /** PROGRESSIVE (SOF2) twin of [[jpegFromDocuments]]: the identical
    * flat-block pixel formula encoded through the multi-scan successive-
    * approximation script — so the q225 gate proves the progressive
    * decode path (DC first/refine, AC first/refine, EOB runs) against
    * the SAME formula oracle as q206, bit-exactly. */
  def jpegProgressiveFromDocuments(spark: SparkSession,
      sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "image",
        JpegCodec.encodeProgressive(jpegPixels(id), quant = 1))))
  }

  /** JPEG media table over the documents corpus ids — the q206 gate input:
    * real entropy-coded baseline streams, decoded statistics exactly
    * reproducible from the generating formula (see above). */
  def jpegFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "image", buildJpegPayload(id))))
  }

  /** The SERVED form of the JPEG corpus: encoded once per corpus by
    * [[graft.IndexCache.ensureJpegCorpus]] and read back from parquet —
    * so q206/q208 time the DECODE path a production ingest pays, not the
    * fixture's entropy-encode (bytes are a pure function of doc ids;
    * results identical under both oracles). */
  def jpegCorpus(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val path = graft.IndexCache.ensureJpegCorpus(spark, sfDir)
    spark.read.parquet(path).as[MediaRow]
  }

  /** JPEG+EXIF fixture corpus (q254): the q206 flat-block streams with an
    * EXIF APP1 spliced after SOI — orientation `1 + id % 8` (all eight
    * values exercised), DateTime `2026:01:DD 12:00:00` with
    * `DD = 10 + id % 17`; every FIFTH id instead carries a syntactically
    * valid APP1 whose TIFF body is broken ([[JpegCodec.exifApp1Malformed]])
    * to pin the None-fallback arm. Pixel payloads are byte-identical to
    * q206's, so decode/header parsing must be EXIF-transparent. */
  def jpegExifCorpus(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val app1 =
          if (id % 5 == 0) JpegCodec.exifApp1Malformed
          else JpegCodec.exifApp1((1 + id % 8).toInt,
            f"2026:01:${10 + id % 17}%02d 12:00:00")
        MediaRow(id, "image",
          JpegCodec.insertApp1(buildJpegPayload(id), app1))
      })
  }

  /** Decoded-statistics pass for the q103 gate: every number derives from
    * the DECODED pixels/samples (dims from the parsed IHDR, sums over the
    * unfiltered raster / PCM samples) — no shortcut to the generator. */
  def decodedStats(media: Dataset[MediaRow]): Dataset[MediaStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      r.kind match {
        case "audio" =>
          WavCodec.decode(r.content) match {
            case Some((meta, samples)) =>
              var sum = 0L; var sq = 0L; var i = 0
              while (i < samples.length) {
                val v = samples(i).toLong; sum += v; sq += v * v; i += 1
              }
              MediaStats(r.media_id, r.kind, "wav", samples.length.toLong,
                sum, sq, 0L, 0L, meta.durationMs)
            case None =>
              MediaStats(r.media_id, r.kind, "bin", 0L, 0L, 0L, 0L, 0L, 0L)
          }
        case _ =>
          val pngFrames = splitFrames(r.content).flatMap(PngCodec.decode)
          val (frames, fmt) =
            if (pngFrames.nonEmpty)
              (pngFrames, if (r.kind == "video") "png-seq" else "png")
            else if (GifCodec.isGif(r.content))
              (GifCodec.frames(r.content).getOrElse(Seq.empty), "gif")
            else (JpegCodec.decode(r.content).toSeq, "jpeg")
          if (frames.isEmpty)
            MediaStats(r.media_id, r.kind, "bin", 0L, 0L, 0L, 0L, 0L, 0L)
          else {
            var n = 0L; var sum = 0L; var sq = 0L
            frames.foreach { img =>
              val px = img.pixels
              var i = 0
              while (i < px.length) {
                val v = (px(i) & 0xff).toLong; sum += v; sq += v * v; i += 1
              }
              n += px.length
            }
            MediaStats(r.media_id, r.kind, fmt,
              n, sum, sq, frames.head.width.toLong, frames.head.height.toLong,
              if (r.kind == "video") frames.size * VideoFrameMs else 0L)
          }
      }
    })
  }

  /** VAD-style energy segmentation over REAL decoded PCM — the audio
    * workhorse transform (silence trimming, speech-segment extraction,
    * per-segment gating all start here): each clip splits into fixed
    * `winLen`-sample windows (80 samples = 10 ms at the corpus's 8 kHz),
    * each window carries its exact squared-energy sum, and `active`
    * compares mean square against the threshold IN INTEGERS
    * (sq_sum >= len * threshold — no division, no float knife edge).
    * Narrow mapPartitions: bytes decode where they sit, only the
    * metadata-sized window table ever shuffles (it is ~n/80 rows per
    * clip). Non-audio rows and undecodable payloads yield no windows. */
  /** VAD SEGMENTS over an [[audioEnergyWindows]] frame — the q216
    * operator, shared with its spec so batch query and constructed-PCM
    * tests run the same definition. Smoothing: one inactive window
    * BETWEEN two active ones is bridged (hangover — sub-frame speech
    * dips must not shatter an utterance); kept windows group into
    * islands via the window_id − row_number() difference (consecutive
    * kept windows share it — one keyed window, no iteration); islands
    * with < `minActive` active windows drop (isolated clicks). All
    * integer arithmetic on the gated flags, so boundaries hash-gate.
    * Shapes: two media-keyed windows + one (media, grp) agg over the
    * ~n/80-row window table; per-media partition size is bounded by
    * clip length, and payload bytes never enter. */
  def vadSegments(wins: DataFrame, minActive: Long = 2L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("window_id")
    wins
      .withColumn("kept",
        when(col("active") === 1L ||
          (coalesce(lag(col("active"), 1).over(w), lit(0L)) === 1L &&
           coalesce(lead(col("active"), 1).over(w), lit(0L)) === 1L),
          1L).otherwise(0L))
      .filter(col("kept") === 1L)
      .withColumn("grp", col("window_id") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(min("window_id").as("start_window"),
        max("window_id").as("end_window"),
        count(lit(1)).as("n_windows"),
        sum("active").as("n_active"),
        sum("sq_sum").as("sq_total"))
      .filter(col("n_active") >= minActive)
      .select("media_id", "start_window", "end_window", "n_windows",
        "n_active", "sq_total")
  }

  /** Perceptual audio fingerprint — the q223 operator and the audio
    * analog of [[imageAHash]] (chromaprint-lite): the SIGN of the
    * energy delta between consecutive `winLen`-sample windows, packed
    * LSB-first into a BIGINT (bit j set iff e(j+1) > e(j), strict — a
    * flat pair is 0 on both engines). Robust to uniform gain and small
    * noise (signs survive), brittle to time shifts by design (shifted
    * audio is different audio at this layer; alignment is a retrieval
    * problem). Bits cap at `maxBits` (≤ 48 keeps every bit far from the
    * sign); n_bits carries the real count so short clips compare fairly.
    * Shape: one keyed agg over the n/winLen window table — bytes decode
    * in place, only (id, fp) pairs ever join. */
  def audioFingerprints(media: Dataset[MediaRow], winLen: Int = 16,
      maxBits: Int = 48): DataFrame = {
    require(maxBits > 0 && maxBits <= 48, s"maxBits in (0,48]: $maxBits")
    audioEnergyWindows(media, winLen = winLen).toDF()
      .groupBy("media_id")
      .agg(sort_array(collect_list(struct(col("window_id"), col("sq_sum"))))
        .as("es"))
      .select(col("media_id"),
        // the >=2 guard makes one-window clips well-defined (fp 0, 0
        // bits): unguarded, sequence(0, -1) is DESCENDING in Spark
        // ([0,-1] — not empty like the oracle's range(0,0)), a latent
        // cross-engine divergence on a public operator (advisor-flagged;
        // unreachable with the >=16-window fixture but guarded anyway)
        when(size(col("es")) >= 2, expr(
          s"""aggregate(sequence(0, least(size(es) - 2, ${maxBits - 1})),
             |  CAST(0 AS BIGINT), (acc, j) ->
             |  acc + CASE WHEN es[j + 1].sq_sum > es[j].sq_sum
             |             THEN shiftleft(CAST(1 AS BIGINT), j)
             |             ELSE CAST(0 AS BIGINT) END)""".stripMargin))
          .otherwise(lit(0L)).as("fingerprint"),
        greatest(least(size(col("es")) - 1, lit(maxBits)), lit(0))
          .cast("long").as("n_bits"))
  }

  def audioEnergyWindows(media: Dataset[MediaRow], winLen: Int = 80,
      meanSqThreshold: Long = 333000L): Dataset[AudioWindow] = {
    require(winLen > 0, "audioEnergyWindows: winLen must be positive")
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { r =>
      WavCodec.decode(r.content) match {
        case Some((_, samples)) =>
          val nWin = (samples.length + winLen - 1) / winLen
          (0 until nWin).map { w =>
            val start = w * winLen
            val end = math.min(start + winLen, samples.length)
            var sq = 0L
            var i = start
            while (i < end) { val v = samples(i).toLong; sq += v * v; i += 1 }
            val len = (end - start).toLong
            AudioWindow(r.media_id, w.toLong, len, sq,
              if (sq >= len * meanSqThreshold) 1L else 0L)
          }
        case None => Seq.empty[AudioWindow]
      }
    }
  }

  /** ViT-style patch extraction over REAL decoded pixels — the vision
    * twin of [[audioEnergyWindows]] and the first step of every
    * patch-embedding pipeline: each image splits into a `patch`×`patch`
    * grid (edge patches clipped to the image bounds, never padded —
    * pw/ph carry the true size so a normalizer can divide correctly),
    * and each patch emits exact integer sum/sum-of-squares over all its
    * channel bytes (mean/variance per patch derive exactly downstream).
    * Narrow mapPartitions: pixels decode where the bytes sit; only the
    * metadata-sized patch table (⌈w/p⌉·⌈h/p⌉ rows per image) shuffles.
    * Non-image rows and undecodable payloads yield no patches. */
  def imagePatches(media: Dataset[MediaRow], patch: Int = 4): Dataset[ImagePatch] = {
    require(patch > 0, "imagePatches: patch must be positive")
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { r =>
      decodeImage(r.content) match {
        case Some(img) =>
          val pr = (img.height + patch - 1) / patch
          val pc = (img.width + patch - 1) / patch
          for { rr <- 0 until pr; cc <- 0 until pc } yield {
            val y0 = rr * patch; val y1 = math.min(y0 + patch, img.height)
            val x0 = cc * patch; val x1 = math.min(x0 + patch, img.width)
            var sum = 0L; var sq = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                var k = 0
                while (k < img.channels) {
                  val v = (img.pixels((y * img.width + x) * img.channels + k)
                    & 0xff).toLong
                  sum += v; sq += v * v; k += 1
                }
                x += 1
              }
              y += 1
            }
            ImagePatch(r.media_id, rr.toLong, cc.toLong,
              (x1 - x0).toLong, (y1 - y0).toLong, sum, sq)
          }
        case None => Seq.empty[ImagePatch]
      }
    }
  }

  /** Perceptual average-hash (aHash) over REAL decoded pixels: resize to
    * size×size through the same nearest-neighbor resample as [[resized]],
    * then bit i is set iff resized pixel i sits at or above the resized
    * mean — compared IN INTEGERS (v·size² >= Σv, the division multiplied
    * away, q156's no-knife-edge rule). Channel 0 carries the luminance
    * (the generator corpus is 8-bit gray; a production caller converts
    * to gray first, the canonical aHash recipe). The hash tolerates
    * brightness scaling and resizing — the near-dup signal pixel-exact
    * fingerprints (q33's media analog) cannot give. Narrow mapPartitions
    * posture: pixels decode where the bytes sit, one 8-byte hash per
    * image is all that ever shuffles. Non-image/undecodable rows yield
    * no hash. */
  def imageAHash(media: Dataset[MediaRow], size: Int = 8): Dataset[ImageHash] = {
    require(size > 0 && size * size <= 64,
      s"imageAHash: size*size must fit in 64 bits (got $size)")
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { r =>
      decodeImage(r.content).map { img =>
        val rs = PngCodec.resize(img, size, size)
        val n = size * size
        var sum = 0L; var i = 0
        while (i < n) {
          sum += (rs.pixels(i * rs.channels) & 0xff).toLong; i += 1
        }
        var bits = 0L; i = 0
        while (i < n) {
          if ((rs.pixels(i * rs.channels) & 0xff).toLong * n >= sum)
            bits |= (1L << i)
          i += 1
        }
        ImageHash(r.media_id, bits)
      }
    }
  }

  /** 8×8 DCT-II basis at 1e6 integer scale: B(u)(x) = round(c(u) ·
    * cos(π(2x+1)u/16) · 1e6) with c(0) = √(1/8), c(u>0) = 1/2.
    * StrictMath (fdlibm bit-specified) so the constants are identical on
    * every JVM; the q241 oracle string interpolates THIS array, so both
    * engines share the same integer basis by construction. */
  private[graft] val DctBasisMicro: Array[Array[Long]] =
    Array.tabulate(8, 8) { (u, x) =>
      val c = if (u == 0) StrictMath.sqrt(1.0 / 8.0) else 0.5
      StrictMath.round(
        c * StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 16.0) * 1e6)
    }

  /** pHash — the DCT upgrade of [[imageAHash]]: resample to 8×8 (same
    * nearest-neighbor path, so the two hashes share their input grid),
    * 2D DCT-II in EXACT integer arithmetic (pixel · basis · basis sums;
    * |term| ≤ 255·5e5·5e5 ≈ 6.4e13, ×64 terms ≈ 4e15 — BIGINT-safe), then
    * bit k = AC coefficient k greater than the 63-AC lower median (the
    * 32nd order statistic of an odd count — an EXACT integer-arithmetic
    * choice, no mean in sight). DC is excluded, which is what buys pHash
    * its brightness invariance: a constant luma shift moves ONLY the DC
    * coefficient, so re-exposed variants of one image collide where
    * byte hashes (q33) and even aHash's mean threshold can drift. 63
    * bits live in positions 0..62 — no sign-bit handling anywhere. */
  def imagePHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { r =>
      decodeImage(r.content).map(img => ImageHash(r.media_id, phashOf(img)))
    }
  }

  /** The pHash kernel factored from [[imagePHash]] (r13 — q255 composes
    * it behind the EXIF orientation transform): 8×8 resample → exact
    * integer 2D DCT-II → 63-AC lower-median sign bits. */
  private[multimodal] def phashOf(img: PngCodec.PngImage): Long = {
    val bas = DctBasisMicro
    val rs = PngCodec.resize(img, 8, 8)
    val p = Array.tabulate(64)(i => (rs.pixels(i * rs.channels) & 0xff).toLong)
    val co = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var ssum = 0L; var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            ssum += p(y * 8 + x) * bas(u)(x) * bas(v)(y); x += 1
          }
          y += 1
        }
        co(v * 8 + u) = ssum; u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(co, 1, 64)
    val sorted = ac.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var bits = 0L; var k = 0
    while (k < 63) { if (ac(k) > med) bits |= (1L << k); k += 1 }
    bits
  }

  // ── EXIF orientation normalization (q255) ────────────────────────────

  /** Apply EXIF orientation `o` to a raster, returning the UPRIGHT
    * image (dims swap for 5-8). The eight transforms are the dihedral
    * group D4 over the pixel grid; channels copy through untouched. */
  def orientApply(img: PngCodec.PngImage, o: Int): PngCodec.PngImage = {
    require(o >= 1 && o <= 8, s"EXIF orientation must be 1-8, got $o")
    if (o == 1) return img
    val (w, h, ch) = (img.width, img.height, img.channels)
    val swap = o >= 5
    val (nw, nh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](nw * nh * ch)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        // (sx, sy) = source pixel that lands at upright (x, y)
        val (sx, sy) = o match {
          case 2 => (w - 1 - x, y)            // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y)    // rotate 180
          case 4 => (x, h - 1 - y)            // mirror vertical
          case 5 => (y, x)                    // transpose
          case 6 => (y, h - 1 - x)            // rotate 90 CW
          case 7 => (w - 1 - y, h - 1 - x)    // transverse
          case _ => (w - 1 - y, x)            // 8: rotate 270 CW
        }
        var c = 0
        while (c < ch) {
          out((y * nw + x) * ch + c) = img.pixels((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.PngImage(nw, nh, ch, out)
  }

  /** The inverse orientation: `orientApply(orientApply(u, exifInverse(o)), o) == u`
    * — what a fixture writer uses to STORE a raster that displays
    * upright under EXIF `o` (rotations 6/8 swap; everything else is an
    * involution). */
  def exifInverse(o: Int): Int = o match {
    case 6 => 8
    case 8 => 6
    case x => x
  }

  /** Oriented-JPEG fixture corpus (q255): each id's UPRIGHT content is
    * the q206 flat-block formula; the STORED raster is the upright
    * image passed through the inverse orientation (so the file displays
    * upright only if the reader honors EXIF), encoded as a real JPEG
    * (dims stay multiples of 8 under D4, so flat-block bit-exactness
    * survives) with the q254 EXIF arms: orientation 1 + id % 8, every
    * FIFTH id malformed-TIFF (fallback = treat raster as upright, and
    * for those ids the stored raster IS upright). */
  def jpegOrientedCorpus(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val malformed = id % 5 == 0
        val o = if (malformed) 1 else (1 + id % 8).toInt
        val raster = orientApply(jpegPixels(id), exifInverse(o))
        val app1 =
          if (malformed) JpegCodec.exifApp1Malformed
          else JpegCodec.exifApp1(o, f"2026:01:${10 + id % 17}%02d 12:00:00")
        MediaRow(id, "image",
          JpegCodec.insertApp1(JpegCodec.encode(raster, quant = 1), app1))
      })
  }

  final case class OrientedHash(media_id: Long, orientation: Long, phash: Long)

  /** All eight D4 pHashes of each image (q259): a rotated/mirrored
    * duplicate WITHOUT EXIF still matches through min-over-D4 as the
    * canonical key — the metadata-free complement of [[orientedPHash]].
    * Decode once, transform+hash eight times in place; 8 longs per
    * image shuffle. */
  def dihedralPHash(media: Dataset[MediaRow]): Dataset[OrientedHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { r =>
      decodeImage(r.content).toSeq.flatMap { img =>
        (1 to 8).map(o =>
          OrientedHash(r.media_id, o.toLong, phashOf(orientApply(img, o))))
      }
    }
  }

  /** Orientation-normalized pHash (q255): decode → EXIF orientation
    * (fallback 1 on absent/malformed) → [[orientApply]] → [[phashOf]].
    * The production pre-hash step: a rotated duplicate hashes
    * IDENTICALLY to its upright original only through this transform.
    * Scale: the q103/q241 posture — decode + hash in place, 3 longs per
    * image shuffle. */
  def orientedPHash(media: Dataset[MediaRow]): Dataset[OrientedHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { r =>
      decodeImage(r.content).map { img =>
        val o = JpegCodec.parseExif(r.content).map(_._1).getOrElse(1)
        OrientedHash(r.media_id, o.toLong, phashOf(orientApply(img, o)))
      }
    }
  }

  /** Per-image near-dup counts over a (media_id, ahash) frame via the
    * q138/q170 4×16-bit block pigeonhole at Hamming ≤ `maxHamming` —
    * the q208 counting core, factored so the hot-bucket cap is directly
    * spec-testable on crafted hash frames (MultimodalSpec).
    *
    * Scale shape: collapse to DISTINCT-HASH CLASSES first. Byte-dup and
    * hash-dup mass becomes one weighted row, the pigeonhole join runs
    * over |distinct| rows, and per-image counts reconstruct EXACTLY from
    * class sizes — n_neardups(h) = (cnt(h) − 1) [same-hash others,
    * Hamming 0] + Σ cnt(h′) over matched classes h′ ≠ h. Degeneracy
    * (near-dup-dense corpora) HELPS instead of fanning the join out
    * quadratically. For full-entropy corpora (distinct ~ n) the q36
    * observe-guard caps each (block-index, block-value) bucket at `cap`
    * distinct-hash reps: capped buckets and skipped candidate slots are
    * observed in-flow under `observeName` (WARN-logged by the registered
    * guard listener when it fires) — recall differs from the unguarded
    * pigeonhole ONLY when a bucket exceeds `cap` distinct hashes, never
    * on dup mass, which the collapse already absorbed.
    *
    * Observability caveat (the CAP always applies; only its METRIC is
    * affected): AQE's post-stage re-planning can elide the
    * CollectMetrics node from the final physical plan when the Hamming
    * predicate constrains the pigeonhole join, leaving
    * `observedMetrics` empty — bisected empirically in MultimodalSpec;
    * the same plan without the bit_count filter keeps the node. The
    * WARN is therefore best-effort under AQE (exact with AQE off, as
    * the spec pins); SCALE.md §observability records the rule. */
  def aHashNearDupCounts(hs: DataFrame, maxHamming: Int = 3,
      cap: Int = graft.dedup.DedupQueries.MaxBucketReps,
      observeName: String = "q208_ahash_guard"): DataFrame = {
    val classes = hs.groupBy("ahash").agg(count(lit(1)).as("cnt"))
    val blocks = classes.select(col("ahash"), col("cnt"),
        explode(array((0 until 4).map(j => struct(lit(j).as("j"),
          shiftrightunsigned(col("ahash"), 16 * j).bitwiseAND(lit(0xFFFFL))
            .as("blk"))): _*)).as("p"))
      .select(col("ahash"), col("cnt"), col("p.j"), col("p.blk"))
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("j", "blk").orderBy("ahash")
    val ranked = blocks.withColumn("rn", row_number().over(wBucket))
    val observed = ranked.observe(observeName,
      count(when(col("rn") === cap + 1, lit(1))).as("capped_buckets"),
      coalesce(sum(when(col("rn") > cap,
        (col("rn") - cap - 1).cast("long"))), lit(0L)).as("skipped_pairs"))
    val reps = ranked.filter(col("rn") <= cap)
    // undirected class pairs (lo < hi), then mirrored so each class
    // sees its full neighbor sum — all frames here are |distinct|-sized
    val pairs = reps.as("a").join(observed.as("b"),
        col("a.j") === col("b.j") && col("a.blk") === col("b.blk") &&
          col("a.ahash") =!= col("b.ahash"))
      .select(least(col("a.ahash"), col("b.ahash")).as("lo"),
        greatest(col("a.ahash"), col("b.ahash")).as("hi"))
      .distinct()
      .filter(expr("bit_count(lo ^ hi)").cast("long") <= maxHamming)
    // mirror via ONE explode, not a union: a union would duplicate the
    // whole pairs subtree INCLUDING the CollectMetrics node (two
    // instances under one name — the metric double-counts and Spark's
    // observedMetrics collection drops the duplicate-named pair
    // entirely, so the guard goes blind)
    val nbrSum = pairs.select(explode(array(
        struct(col("lo").as("ahash"), col("hi").as("o")),
        struct(col("hi").as("ahash"), col("lo").as("o")))).as("e"))
      .select(col("e.ahash").as("ahash"), col("e.o").as("o"))
      .join(classes.select(col("ahash").as("o"), col("cnt").as("ocnt")), "o")
      .groupBy("ahash").agg(sum("ocnt").as("nbr"))
    val nd = classes.join(nbrSum, Seq("ahash"), "left_outer")
      .select(col("ahash"),
        (col("cnt") - 1 + coalesce(col("nbr"), lit(0L))).as("n_nd"))
    // no broadcast hint: on dup-dense corpora nd is tiny and AQE
    // broadcasts it; at full entropy distinct ~ n and a forced
    // broadcast would be the bug
    hs.join(nd, Seq("ahash"))
      .select(col("media_id"), col("ahash"), col("n_nd").as("n_neardups"))
  }

  /** Per-frame-pair motion energy over REAL decoded video frames — the
    * temporal primitive scene-cut detection and motion-aware frame
    * sampling build on: for each consecutive frame pair, the exact
    * integer sum of per-pixel absolute differences (L1 motion; channel
    * bytes compared positionally). A cut shows as a spike; a static
    * segment as near-zero — and a frame sampler keyed on this signal
    * picks informative frames instead of a blind stride
    * ([[sampledFrames]]' upgrade path). Narrow mapPartitions: frames
    * decode where the bytes sit; output is frames−1 metadata rows per
    * video. Pairs with mismatched dims (mid-stream format change) and
    * undecodable frames are skipped rather than fabricated. */
  def frameMotion(media: Dataset[MediaRow]): Dataset[FrameMotion] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frames = splitFrames(r.content).flatMap(PngCodec.decode)
      frames.iterator.sliding(2).withPartial(false).zipWithIndex.collect {
        case (Seq(a, b), f)
            if a.width == b.width && a.height == b.height &&
              a.channels == b.channels =>
          var sum = 0L
          var i = 0
          while (i < a.pixels.length) {
            sum += math.abs((a.pixels(i) & 0xff) - (b.pixels(i) & 0xff)).toLong
            i += 1
          }
          FrameMotion(r.media_id, f.toLong, (f + 1).toLong,
            a.pixels.length.toLong, sum)
      }.toSeq
    }
  }
}
