package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join: refunds match their transaction only
  * within the 7-day window, across micro-batches, on unbounded inputs. */
class StreamingRefundJoinSpec extends SparkSpec {

  private val T0 = 1700000000000000L // µs anchor
  private val Day = 86400L * 1000000

  test("refunds join transactions within 7 days, across batches; late ones don't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val txnsIn = MemoryStream[(String, Long)]
    val refundsIn = MemoryStream[(String, Long, Double)]
    val txns = txnsIn.toDS().toDF("id", "us")
      .select(col("id").as("txn_id"), timestamp_micros(col("us")).as("txn_ts"))
    val refunds = refundsIn.toDS().toDF("rid", "rus", "amt")
      .select(col("rid").as("refund_txn_id"),
        timestamp_micros(col("rus")).as("refund_ts"),
        col("amt").as("refund_amount"))

    val q = StreamingRefundJoin.joined(txns, refunds)
      .select("txn_id", "refund_amount")
      .writeStream.format("memory").queryName("refund_join")
      .outputMode("append").start()
    try {
      // txn batch first; refunds arrive in a LATER micro-batch
      txnsIn.addData(("t1", T0), ("t2", T0))
      q.processAllAvailable()
      refundsIn.addData(
        ("t1", T0 + 2 * Day, 10.0), // within window → matches
        ("t2", T0 + 9 * Day, 20.0), // past 7 days → must NOT match
        ("t9", T0 + 1 * Day, 30.0)) // unknown txn → no match
      q.processAllAvailable()

      val out = spark.table("refund_join").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toSet
      assert(out == Set("t1" -> 10.0), s"unexpected join output: $out")
    } finally q.stop()
  }

  test("left-outer: unrefunded txns emit with NULLs once their window closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val txnsIn = MemoryStream[(String, Long)]
    val refundsIn = MemoryStream[(String, Long, Double)]
    val txns = txnsIn.toDS().toDF("id", "us")
      .select(col("id").as("txn_id"), timestamp_micros(col("us")).as("txn_ts"))
    val refunds = refundsIn.toDS().toDF("rid", "rus", "amt")
      .select(col("rid").as("refund_txn_id"),
        timestamp_micros(col("rus")).as("refund_ts"),
        col("amt").as("refund_amount"))

    val q = StreamingRefundJoin.joinedLeftOuter(txns, refunds,
        watermark = "1 hour", maxLag = "7 days")
      .select("txn_id", "refund_amount")
      .writeStream.format("memory").queryName("refund_outer")
      .outputMode("append").start()
    try {
      txnsIn.addData(("t1", T0), ("t2", T0))
      refundsIn.addData(("t1", T0 + 2 * Day, 10.0)) // t1 refunded, t2 not
      q.processAllAvailable()
      // before the window closes, t2 must NOT have emitted (it's "not
      // yet", not "never")
      val early = spark.table("refund_outer").collect()
        .map(_.getString(0)).toSet
      assert(!early.contains("t2"), s"t2 emitted before its window closed: $early")

      // advance BOTH watermarks far past t2's whole match window
      // (txn_ts + 7 d + 1 h) — the unmatched row becomes a fact and emits
      txnsIn.addData(("t9", T0 + 20 * Day))
      refundsIn.addData(("t9", T0 + 20 * Day, 0.0))
      q.processAllAvailable()
      // one more empty-ish batch lets the state-eviction output flush
      txnsIn.addData(("t10", T0 + 21 * Day))
      q.processAllAvailable()

      val out = spark.table("refund_outer").collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(out.get("t1").flatten.contains(10.0), s"t1 lost its match: $out")
      assert(out.contains("t2") && out("t2").isEmpty,
        s"t2 should have emitted with NULL refund after window close: $out")
    } finally q.stop()
  }
}
