package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the remaining Structured Streaming
  * operator family (beyond file-source ingest, watermarked dedup, windowed
  * aggregation, foreachBatch validation, and custom-state sessionization):
  * two unbounded streams joined with a key equality + event-time bound.
  *
  * Domain shape: transactions matched with their refund events within 7
  * days. Both sides are watermarked and the join condition bounds
  * refund_ts relative to txn_ts, so Spark can expire join state once the
  * watermark passes each row's match window — bounded state on unbounded
  * streams, which is the only version of this join that survives 100
  * TB/day. An unbounded condition would accumulate state forever.
  */
object StreamingRefundJoin {

  /** `txns` needs (txn_id, txn_ts); `refunds` needs (refund_txn_id,
    * refund_ts, refund_amount). Inner interval join: refund within
    * [txn_ts, txn_ts + maxLag]. */
  def joined(txns: DataFrame, refunds: DataFrame,
      watermark: String = "1 hour", maxLag: String = "7 days"): DataFrame =
    join(txns, refunds, watermark, maxLag, "inner")

  /** LEFT OUTER variant — the "which transactions were NEVER refunded"
    * stream. Matched rows emit like the inner join; an UNMATCHED txn
    * emits with NULL refund columns only once the watermark passes the
    * end of its whole match window (txn_ts + maxLag + watermark) — the
    * earliest moment "no refund" is a fact rather than "not yet". Same
    * bounded-state contract: the event-time bound lets Spark expire both
    * sides' join state. */
  def joinedLeftOuter(txns: DataFrame, refunds: DataFrame,
      watermark: String = "1 hour", maxLag: String = "7 days"): DataFrame =
    join(txns, refunds, watermark, maxLag, "leftOuter")

  private def join(txns: DataFrame, refunds: DataFrame,
      watermark: String, maxLag: String, how: String): DataFrame =
    txns.withWatermark("txn_ts", watermark)
      .join(
        refunds.withWatermark("refund_ts", watermark),
        expr(s"""
          refund_txn_id = txn_id AND
          refund_ts >= txn_ts AND
          refund_ts <= txn_ts + INTERVAL $maxLag"""),
        how)
}
