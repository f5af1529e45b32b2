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
    txns.withWatermark("txn_ts", watermark)
      .join(
        refunds.withWatermark("refund_ts", watermark),
        expr(s"""
          refund_txn_id = txn_id AND
          refund_ts >= txn_ts AND
          refund_ts <= txn_ts + INTERVAL $maxLag"""),
        "inner")
}
