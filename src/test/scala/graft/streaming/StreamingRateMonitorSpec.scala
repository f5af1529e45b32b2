package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingRateMonitor: (1) the final emission over a bounded replay of
  * the driver events table equals catalog q145_rate_anomaly row for row
  * (stream == batch, 6-dp bit-parity); (2) the answer is invariant to
  * micro-batch boundaries — the map state folds increments exactly; (3)
  * a spike is flagged as soon as its partial count crosses the band
  * (the early-warning semantics the batch form cannot give). */
class StreamingRateMonitorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def normalizedEvents =
    graft.analytics.Ops.normalizeEventTs(
      spark.read.parquet(s"$sf/events.parquet"))

  private def latestPerDay(table: String): Map[(String, Long), (Long, Double, Double)] =
    // update mode appends one row per (type, day, batch); the monitor
    // re-emits a flagged day each batch with its CURRENT count, so the
    // latest emission per (type, day) is the one with the largest n
    spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

  test("replayed stream's final flags == q145 batch, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = normalizedEvents.select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = graft.SparkEntry.queries("q145_rate_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(expected.nonEmpty, "parity needs a non-empty batch answer")

    for ((nBatches, name) <- Seq(1 -> "rate_one", 3 -> "rate_three")) {
      val input = MemoryStream[(String, Long)]
      val q = StreamingRateMonitor.monitor(input.toDS().toDF("event_type", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        val per = math.max(1, rows.length / nBatches + 1)
        rows.grouped(per).foreach { chunk =>
          input.addData(chunk.toSeq); q.processAllAvailable()
        }
        assert(latestPerDay(name) == expected,
          s"$nBatches-batch replay diverged from q145")
      } finally q.stop()
    }
  }

  test("a spike is flagged early, while its day is still filling") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayNs(d: Long) = d * 86400L * 1000000000L
    // 7 quiet days (10 events each), then day 8 spikes
    val quiet = for (d <- 1L to 7L; i <- 1 to 10)
      yield ("click", dayNs(d) + i * 1000L)
    val input = MemoryStream[(String, Long)]
    val q = StreamingRateMonitor.monitor(input.toDS().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("rate_early")
      .outputMode("update").start()
    try {
      input.addData(quiet); q.processAllAvailable()
      assert(spark.table("rate_early").count() == 0, "quiet week must not flag")
      // variance is 0 (all-equal window): band = mean = 10; 11 partial
      // events already exceed it mid-day
      input.addData((1 to 11).map(i => ("click", dayNs(8L) + i * 1000L)))
      q.processAllAvailable()
      val flagged = latestPerDay("rate_early")
      assert(flagged.contains(("click", 8L)), s"spike not flagged: $flagged")
      assert(flagged(("click", 8L))._1 == 11L)
    } finally q.stop()
  }
}
