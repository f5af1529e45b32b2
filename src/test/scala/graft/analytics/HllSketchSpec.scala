package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q82's sketch-table contract: unioning per-day HLL sketches must equal
  * sketching the raw events directly (register-max is associative over any
  * partitioning of the data), the estimate must sit within the sketch's
  * error band of the exact distinct count, and repeated runs must be
  * bit-stable. These are the properties that let a 100 TB lake keep a
  * daily sketch rollup and answer range queries without rescanning. */
class HllSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def events = graft.analytics.Ops.t(spark, sf, "events")

  test("q82: merged daily sketches == one direct sketch over raw events") {
    val merged = graft.SparkEntry.queries("q82_hll_sketch_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      s"daily-union and direct sketch estimates diverged:\n$merged\n$direct")
  }

  test("q82: estimates land within the lgK=12 error band of exact distincts") {
    val est = graft.SparkEntry.queries("q82_hll_sketch_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (tpe, n) =>
      // lgK=12 → relative standard error ~1.6%; 5% is > 3 sigma
      assert(math.abs(est(tpe) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$tpe: estimate ${est(tpe)} vs exact $n drifted past 5%")
    }
  }

  test("q82: repeated runs produce identical estimates (no randomness)") {
    def run() = graft.SparkEntry.queries("q82_hll_sketch_rollup")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
