package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream ⇄ batch parity for sliding windows: the native
  * `window(ev_ts, "30 minutes", "15 minutes")` streaming aggregation must
  * reproduce q85's floor-div bucket arithmetic row-for-row — which also
  * transitively pins the streaming result to q85's DuckDB oracle. */
class StreamingSlidingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming sliding totals == q85 batch on a replayed corpus") {
    val root = Files.createTempDirectory("graft-sliding").toString
    val events = graft.analytics.Ops.normalizeEventTs(
      spark.read.parquet(s"$sf/events.parquet"))
    events.coalesce(1).write.parquet(s"$root/in")

    val stream = spark.readStream.schema(events.schema).parquet(s"$root/in")
    val q = StreamingSlidingWindows.slidingEventTotals(stream)
      .writeStream.format("memory").queryName("sliding_out")
      // complete mode emits every window regardless of watermark progress —
      // the right sink mode for a bounded replay parity check
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val got = spark.table("sliding_out").collect().map(key).toSet
    val expected = graft.SparkEntry.queries("q85_sliding_windows")(spark, sf)
      .collect().map(key).toSet
    assert(got == expected,
      s"stream/batch divergence: stream-only ${got.diff(expected).take(3)}, " +
        s"batch-only ${expected.diff(got).take(3)}")
    assert(got.nonEmpty)
  }
}
