package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.text.TextSignals

/** Streaming document ingestion for the training-data pipeline: the
  * continuous counterpart of the batch quality gate (q31) + exact dedup
  * (q35) over an unbounded document feed.
  *
  * Shape: watermarked event-time stream → quality score (the SAME
  * TextSignals expressions the batch queries use — parity by shared
  * definition) → threshold filter → `dropDuplicatesWithinWatermark` on the
  * normalized content fingerprint.
  *
  * Scale posture: the quality gate is a narrow codegen'd map (no state);
  * dedup state is ONE (fingerprint → timestamp) entry per distinct doc
  * inside the watermark horizon — bounded by ingest rate × watermark, not
  * by stream lifetime (plain dropDuplicates would grow state forever).
  * Near-dup (MinHash) dedup stays a batch compaction pass over the landed
  * zone (q36/q62): LSH banding needs cross-row joins that streaming state
  * can't express without unbounded buffering — the lambda-architecture
  * split is deliberate and documented, not an omission. */
object StreamingDocIngest {

  /** quality-gate + watermark-bounded exact dedup over a stream of
    * (doc_id, text, ingest_ts). Output adds quality_score + fp. */
  def pipeline(docs: DataFrame, minQuality: Double = 1.0,
      watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .withColumn("quality_score", TextSignals.qualityScore(col("text")))
      .filter(col("quality_score") >= minQuality)
      .withColumn("fp", TextSignals.normalizedFingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fp")

  /** Append the cleaned stream to a parquet zone (checkpointed,
    * backlog-drain trigger — the same posture as the other streaming
    * stages). */
  def writeDocs(clean: DataFrame, path: String, checkpoint: String): StreamingQuery =
    clean.writeStream
      .format("parquet")
      .option("path", path)
      .option("compression", "snappy")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
