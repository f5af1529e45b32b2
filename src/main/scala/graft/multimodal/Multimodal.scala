package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators implemented as partition-batched transforms.
  *
  * The Spark-side plumbing (schema, encoders, partition batching, operator
  * signatures) is real and tested; the codec layer is a clearly-marked
  * deterministic STUB (`FakeCodec`) because no image/audio libraries exist
  * in this environment — swapping in a real decoder changes one function.
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
      format: String,    // png | wav | mp4 | ... (stub: sniffed from header)
      nBytes: Long,
      width: Int,        // 0 when not applicable
      height: Int,
      durationMs: Long)  // 0 for still images

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, meta: MediaMeta, features: Array[Float])

  /** STUB codec — deterministic fake standing in for a real decode library.
    * Parses a tiny fake header (first 4 bytes = format tag) and derives
    * metadata/features from content hashes so tests are reproducible. A
    * production build replaces exactly this object. */
  object FakeCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 4) new String(bytes.take(4), "US-ASCII").trim.toLowerCase
      else "bin"

    /** ??? in spirit: a real implementation would decode pixels/samples.
      * The fake derives deterministic pseudo-dimensions from a content hash. */
    def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.floorMod(h, 1024)
      MediaMeta(kind, sniffFormat(bytes), bytes.length.toLong, w,
        math.floorMod(h >> 10, 1024) + 64,
        if (kind == "image") 0L else math.floorMod(h.toLong, 600000L))
    }

    /** Deterministic fake embedding: 8 floats folded from content bytes. */
    def extractFeatures(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { acc(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      acc
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.max(16, math.min(bytes.length, w * h / 64))) // stub

    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(math.max(1, bytes.length / math.max(1, everyN))).take(everyN).toSeq
  }

  /** Decode + feature-extract, batched per partition. The imperative loop
    * touches each payload exactly once per partition; no bytes cross the
    * shuffle boundary. Metadata goes through [[HeaderCodec]] FIRST — real
    * PNG/WAV header parsing, byte arithmetic only — and falls back to the
    * stub for unknown/corrupt containers, so ingest never crashes and
    * only pixel/sample decode remains stubbed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id,
          HeaderCodec.decode(r.kind, r.content)
            .getOrElse(FakeCodec.decode(r.kind, r.content)),
          FakeCodec.extractFeatures(r.content))
      }
    }
  }

  /** Resize operator (stubbed transform, real plumbing + batch shape). */
  def resized(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(content = FakeCodec.resize(r.content, w, h))))
  }

  /** Frame sampling: one row per sampled frame (video → stills). */
  def sampledFrames(media: Dataset[MediaRow], frames: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      FakeCodec.sampleFrames(r.content, frames).zipWithIndex.map {
        case (f, i) => MediaRow(r.media_id * 1000 + i, "image", f)
      }
    }
  }

  /** Fabricate a media table from the documents corpus (UTF-8 payloads with
    * a fake format header) — lets every operator be exercised on driver
    * testdata without real codecs. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        concat(lit("PNG "), col("text")).cast("binary").as("content"))
      .as[MediaRow]
  }
}
