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
}
