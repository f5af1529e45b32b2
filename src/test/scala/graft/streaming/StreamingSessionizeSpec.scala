package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** flatMapGroupsWithState sessionization: finalized sessions must match the
  * batch q26 gap semantics, emit exactly once (append mode), and close via
  * event-time timeout when a user goes silent. */
class StreamingSessionizeSpec extends SparkSpec {

  private val T0 = 1700000000000000L // µs anchor
  private val Min = 60L * 1000000

  test("gap sessions finalize as the watermark passes, once each") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDS().toDF("user_id", "event_us")
      .select(col("user_id"), timestamp_micros(col("event_us")).as("ts"))
    val q = StreamingSessionize.sessions(events)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      input.addData((1L, T0), (1L, T0 + 10 * Min), (2L, T0 + 5 * Min))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // nothing closed yet

      // watermark jumps 3 h ahead -> both sessions pass end+gap
      input.addData((9L, T0 + 180 * Min))
      q.processAllAvailable()
      // timeouts fire as the watermark advances; one more batch flushes
      input.addData((9L, T0 + 181 * Min))
      q.processAllAvailable()

      val out = spark.table("sessions_out")
        .as[UserSession].collect().sortBy(_.user_id)
      val u1 = out.filter(_.user_id == 1L)
      val u2 = out.filter(_.user_id == 2L)
      assert(u1.toSeq == Seq(UserSession(1L, T0, T0 + 10 * Min, 2L)))
      assert(u2.toSeq == Seq(UserSession(2L, T0 + 5 * Min, T0 + 5 * Min, 1L)))
    } finally q.stop()
  }

  test("out-of-order events within the watermark merge into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDS().toDF("user_id", "event_us")
      .select(col("user_id"), timestamp_micros(col("event_us")).as("ts"))
    val q = StreamingSessionize.sessions(events)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      // same batch, reversed order: 20min-apart events still one session
      input.addData((5L, T0 + 20 * Min), (5L, T0))
      q.processAllAvailable()
      input.addData((9L, T0 + 300 * Min))
      q.processAllAvailable()
      input.addData((9L, T0 + 301 * Min))
      q.processAllAvailable()
      val u5 = spark.table("sessions_ooo").as[UserSession]
        .collect().filter(_.user_id == 5L)
      assert(u5.toSeq == Seq(UserSession(5L, T0, T0 + 20 * Min, 2L)))
    } finally q.stop()
  }
}
