package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingVelocity: a bounded replay of the driver events table must
  * aggregate to EXACTLY the batch q193 per-user risk summary (same window,
  * same threshold), invariant to micro-batch splits; bursts finalize only
  * at the watermark so out-of-order arrivals inside the delay cannot skew
  * a count. */
class StreamingVelocitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Driver events as (user_id, us), ascending by time (replay order). */
  private def eventRows: Array[(Long, Long)] =
    graft.analytics.Ops.t(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)

  private def batchExpected: Map[Long, (Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q193_velocity")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("max_burst"),
          r.getAs[Long]("n_flagged"), r.getAs[Long]("velocity_flag")))).toMap

  test("replayed stream aggregates == batch q193, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val expected = batchExpected
    val sentinelUser = 999999L
    val far = rows.map(_._2).max + 30L * 86400000000L // +30 days

    for ((nBatches, name) <- Seq(1 -> "vel_one", 4 -> "vel_four")) {
      val input = MemoryStream[(Long, Long)]
      val q = StreamingVelocity.flags(
          input.toDS().toDF("user_id", "event_us")
            .select(col("user_id"),
              timestamp_micros(col("event_us")).as("ts")))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val per = math.max(1, rows.length / nBatches + 1)
        rows.grouped(per).foreach { chunk =>
          input.addData(chunk.toSeq); q.processAllAvailable()
        }
        // advance the watermark far past every real event, then flush the
        // resulting event-time timeouts with one more batch
        input.addData((sentinelUser, far)); q.processAllAvailable()
        input.addData((sentinelUser, far + 1000000L)); q.processAllAvailable()

        val got = spark.table(name)
          .filter(col("user_id") =!= sentinelUser)
          .groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            max(col("burst")).as("max_burst"),
            sum(col("flagged")).as("n_flagged"))
          .collect().map(r => r.getAs[Long]("user_id") ->
            ((r.getAs[Long]("n_events"), r.getAs[Long]("max_burst"),
              r.getAs[Long]("n_flagged"),
              if (r.getAs[Long]("n_flagged") > 0) 1L else 0L))).toMap
        assert(got == expected,
          s"$nBatches-batch velocity replay diverged from q193")
      } finally q.stop()
    }
  }

  test("each event finalizes exactly once (append mode, no double emission)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val input = MemoryStream[(Long, Long)]
    val q = StreamingVelocity.flags(
        input.toDS().toDF("user_id", "event_us")
          .select(col("user_id"), timestamp_micros(col("event_us")).as("ts")))
      .writeStream.format("memory").queryName("vel_once")
      .outputMode("append").start()
    try {
      rows.grouped(250).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val far = rows.map(_._2).max + 30L * 86400000000L
      input.addData((999999L, far)); q.processAllAvailable()
      input.addData((999999L, far + 1000000L)); q.processAllAvailable()
      val n = spark.table("vel_once")
        .filter(col("user_id") =!= 999999L).count()
      assert(n == rows.length, s"emitted $n rows for ${rows.length} events")
    } finally q.stop()
  }

  test("an out-of-order arrival inside the delay lands in the trailing frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 1700000000000000L
    val input = MemoryStream[(Long, Long)]
    val q = StreamingVelocity.flags(
        input.toDS().toDF("user_id", "event_us")
          .select(col("user_id"), timestamp_micros(col("event_us")).as("ts")),
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("vel_ooo")
      .outputMode("append").start()
    try {
      // in-order event, then an EARLIER one (5 min back, inside the delay)
      input.addData((7L, T0 + 5L * 60000000)); q.processAllAvailable()
      input.addData((7L, T0)); q.processAllAvailable()
      // advance watermark; flush timeouts
      input.addData((999999L, T0 + 90L * 86400000000L)); q.processAllAvailable()
      input.addData((999999L, T0 + 91L * 86400000000L)); q.processAllAvailable()
      val got = spark.table("vel_ooo").filter(col("user_id") === 7L)
        .collect().map(r => r.getAs[Long]("ts_us") -> r.getAs[Long]("burst"))
        .toMap
      // the later event's burst must count the out-of-order earlier one
      assert(got == Map(T0 -> 1L, (T0 + 5L * 60000000) -> 2L),
        s"out-of-order burst wrong: $got")
    } finally q.stop()
  }

  test("pre-1970 event times cannot kill the query (engine epoch floor + clamp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch q193 supports negative nanos (AdversarialEventsSpec); the
    // STREAM twin's domain starts at the epoch — Spark's event-time
    // watermark initializes at 0 ms and the late-row filter drops
    // anything earlier AT INGEST, so pre-1970 events never reach the
    // operator (documented batch/stream domain divergence). This case
    // pins that an adversarial pre-1970 feed (the input class the r07
    // advisor flagged: a negative setTimeoutTimestamp would throw and
    // kill the query) leaves the query ALIVE and the >= epoch traffic
    // intact; the timeout clamp in StreamingVelocity.flags is the
    // belt-and-braces guard should the engine floor ever change.
    val Tneg = -86400000000L // 1969-12-31
    val T0 = 1700000000000000L
    val input = MemoryStream[(Long, Long)]
    val q = StreamingVelocity.flags(
        input.toDS().toDF("user_id", "event_us")
          .select(col("user_id"), timestamp_micros(col("event_us")).as("ts")),
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("vel_neg")
      .outputMode("append").start()
    try {
      input.addData((3L, Tneg)); q.processAllAvailable()
      input.addData((3L, Tneg + 60000000L), (4L, T0)); q.processAllAvailable()
      // advance the watermark far forward; flush timeouts
      input.addData((999999L, T0 + 90L * 86400000000L)); q.processAllAvailable()
      input.addData((999999L, T0 + 91L * 86400000000L)); q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"query died on pre-1970 input: ${q.exception}")
      val gotNeg = spark.table("vel_neg").filter(col("user_id") === 3L).count()
      assert(gotNeg == 0L,
        s"pre-1970 events unexpectedly traversed the watermark floor: $gotNeg")
      val gotPos = spark.table("vel_neg").filter(col("user_id") === 4L)
        .collect().map(r => r.getAs[Long]("ts_us") -> r.getAs[Long]("burst"))
        .toMap
      assert(gotPos == Map(T0 -> 1L),
        s">= epoch traffic mishandled alongside pre-1970 input: $gotPos")
    } finally q.stop()
  }
}
