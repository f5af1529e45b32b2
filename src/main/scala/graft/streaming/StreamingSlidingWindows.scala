package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.Ops

/** Sliding event-time window totals — the streaming twin of catalog
  * q85_sliding_windows (30 min window, 15 min slide over `events`).
  *
  * The batch query buckets by MicrosFloorDivSpec-pinned floor-div
  * arithmetic so its DuckDB oracle is exact; THIS side uses Spark's
  * native `window(col, "30 minutes", "15 minutes")` under a watermark —
  * the idiomatic streaming form with state eviction. The two must agree
  * row-for-row on any replayed corpus (native sliding windows are
  * epoch-aligned, exactly the floor-div buckets): StreamingSlidingSpec
  * pins stream == q85 batch on the driver testdata, closing the triangle
  * batch-arithmetic == DuckDB == streaming-native.
  *
  * Scale notes: sliding state is bounded by (windows-per-slide ×
  * event_types × watermark horizon) aggregate rows — KB-sized; the
  * watermark evicts finalized windows so a month-long replay holds hours
  * of state, not the month. Late events inside the horizon re-open their
  * windows (correct totals); beyond it they are dropped by contract —
  * the same trade every production sliding agg makes.
  */
object StreamingSlidingWindows {

  /** events (ts = nanos-since-epoch LONG, the testdata contract) →
    * per-(window, event_type) counts and exact sums. Aggregations mirror
    * q85: COUNT + decimal-exact sum surfaced as DOUBLE, so stream and
    * batch hash identically. */
  def slidingEventTotals(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      // true-floor nanos→micros (q25/q26 pattern), then a proper timestamp
      // for the event-time machinery
      .withColumn("ev_ts", timestamp_micros(
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      .withWatermark("ev_ts", watermark)
      .groupBy(window(col("ev_ts"), "30 minutes", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Ops.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
}
