package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.transform.Bronze

/** Structured Streaming variant of the bronze stage — the reference's
  * "Potential Upgrade" (`README.md:133`): file-source readStream over the
  * raw zone, the same pure transforms, watermarked streaming dedup, and
  * windowed daily totals.
  *
  * The batch transforms are reused verbatim where stream-safe (cast,
  * normalise, derive); only dedup changes shape: the batch row_number
  * window (`etl_transactions_bronze.py:61-80`) becomes
  * `withWatermark + dropDuplicatesWithinWatermark` — bounded state, exactly
  * the semantics a 100 TB/day continuous ingest needs (state expires with
  * the watermark instead of growing forever).
  */
object StreamingBronze {

  /** File-source stream over the raw CSV zone (same 8-column contract). */
  def readRawStream(spark: SparkSession, rawDir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(Schemas.raw)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(rawDir)

  /** Stream-safe bronze pipeline: cast → normalise → watermarked dedup on
    * txn_id → derive txn_date.
    *
    * Documented divergences from batch bronze:
    *  - late data beyond the watermark is dropped from dedup state (batch
    *    sees all rows);
    *  - rows whose txn_ts failed to parse (try_to_timestamp → NULL) are
    *    EXCLUDED here, not carried: a null event-time row cannot take part
    *    in watermarked dedup, and leaving it in would make the behavior
    *    engine-version-dependent. Batch keeps them (audit quarantines them
    *    downstream); streaming callers route them via [[nullTsQuarantine]]
    *    on the same raw stream instead. */
  def pipeline(raw: DataFrame, watermark: String = "1 day"): DataFrame =
    raw
      .transform(Bronze.castDtypes)
      .transform(Bronze.normaliseStrings)
      .filter(col("txn_ts").isNotNull)
      .withWatermark("txn_ts", watermark)
      .dropDuplicatesWithinWatermark("txn_id")
      .transform(Bronze.deriveTxnDate)

  /** The streaming audit split for unparseable-timestamp rows excluded by
    * [[pipeline]] — write this alongside the bronze sink so no raw row is
    * silently lost (batch parity: Audit.tagRejects catches them later). */
  def nullTsQuarantine(raw: DataFrame): DataFrame =
    raw
      .transform(Bronze.castDtypes)
      .transform(Bronze.normaliseStrings)
      .filter(col("txn_ts").isNull)

  /** Continuous partitioned-Parquet bronze sink. AvailableNow processes the
    * current backlog then stops — the streaming twin of a scheduled batch
    * run, with exactly-once file-sink semantics via the checkpoint. */
  def writeBronze(bronze: DataFrame, outPath: String,
      checkpoint: String): StreamingQuery =
    bronze.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("txn_date")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Tumbling 1-day merchant totals — the gold daily aggregate
    * (`README.md:130`) as a streaming query. Pass `watermark = Some(...)`
    * only when the upstream has none (e.g. reading bronze directly);
    * [[pipeline]] already watermarks for dedup and Spark forbids
    * redefining it downstream. */
  def dailyMerchantTotals(bronze: DataFrame,
      watermark: Option[String] = None): DataFrame =
    watermark.fold(bronze)(w => bronze.withWatermark("txn_ts", w))
      .groupBy(window(col("txn_ts"), "1 day"), col("merchant_id"))
      .agg(
        count(lit(1)).as("txn_count"),
        sum("amount").as("total_amount"))
      .select(
        col("window.start").cast("date").as("txn_date"),
        col("merchant_id"), col("txn_count"), col("total_amount"))
}
