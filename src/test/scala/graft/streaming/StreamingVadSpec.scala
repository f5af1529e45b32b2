package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

/** StreamingVad: replaying the fixture corpus's audio windows (plus the
  * constructed bridge/split/isolated clips from VadSegmentsSpec) must
  * emit EXACTLY the batch q216 segment rows — invariant to micro-batch
  * splits and to arrival order inside the watermark delay, with the
  * tail flushing on the event-time timeout (no poison-pill row per
  * media). */
class StreamingVadSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val BaseUs = 1700000000000000L
  private val StepUs = StreamingVad.DefaultStepUs

  /** (media_id, window_id, active, sq_sum, us) for the fixture corpus +
    * the constructed clips, on the contract event-time line. */
  private def windowRows: Array[(Long, Long, Long, Long, Long)] = {
    val fixture = Multimodal.audioEnergyWindows(
        Multimodal.fromDocuments(spark, sf)).toDF()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getLong(3)))
    val constructed = Seq(
      9000001L -> Seq(1, 1, 0, 1, 1), // bridged dip
      9000002L -> Seq(1, 0, 0, 1, 1), // 2-gap split, lone head drops
      9000003L -> Seq(0, 1, 0, 0),    // isolated click
      9000004L -> Seq(1, 1))          // plain run
      .flatMap { case (id, p) =>
        p.zipWithIndex.map { case (a, w) =>
          (id, w.toLong, a.toLong, if (a == 1) 80000000L else 0L)
        }
      }
    (fixture ++ constructed).map { case (m, w, a, sq) =>
      (m, w, a, sq, BaseUs + w * StepUs)
    }
  }

  /** Batch q216 semantics over the same window rows — the parity target. */
  private def batchExpected(
      rows: Array[(Long, Long, Long, Long, Long)]): Set[Seq[Long]] = {
    import spark.implicits._
    Multimodal.vadSegments(
        rows.toSeq.toDF("media_id", "window_id", "active", "sq_sum", "us")
          .withColumn("len", lit(80L)))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
  }

  test("stream == batch q216 across micro-batch splits and arrival shuffles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = windowRows
    val expected = batchExpected(rows)
    assert(expected.nonEmpty)
    val sentinel = 8888888L
    val far = BaseUs + 365L * 86400000000L

    val cases = Seq(
      (1, false, "vad_one"),
      (4, false, "vad_four"),
      (4, true, "vad_shuffled"))
    for ((nBatches, shuffle, name) <- cases) {
      val feed = if (shuffle)
        rows.sortBy { case (m, w, _, _, _) => ((m * 31 + w * 17) % 97, m, w) }
      else rows
      val input = MemoryStream[(Long, Long, Long, Long, Long)]
      val q = StreamingVad.segments(
          input.toDS()
            .toDF("media_id", "window_id", "active", "sq_sum", "us")
            .select(col("media_id"), col("window_id"), col("active"),
              col("sq_sum"), timestamp_micros(col("us")).as("ts")))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val per = math.max(1, feed.length / nBatches + 1)
        feed.grouped(per).foreach { chunk =>
          input.addData(chunk.toSeq); q.processAllAvailable()
        }
        // advance the watermark far past every clip, then flush the
        // event-time timeouts with one more batch
        input.addData((sentinel, 0L, 0L, 0L, far)); q.processAllAvailable()
        input.addData((sentinel, 1L, 0L, 0L, far + 1000000L))
        q.processAllAvailable()

        val got = spark.table(name)
          .filter(col("media_id") =!= sentinel)
          .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        assert(got == expected,
          s"$name diverged from batch q216: " +
            s"missing=${(expected -- got).take(3)} " +
            s"extra=${(got -- expected).take(3)}")
        // exactly-once: append-mode emissions never duplicate
        val n = spark.table(name)
          .filter(col("media_id") =!= sentinel).count()
        assert(n == expected.size.toLong, s"$name duplicated emissions")
      } finally q.stop()
    }
  }

  test("segments finalize incrementally, not only at stream end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one clip: [1,1,0,0, ...silence...] — the segment closes at window 2
    // and must emit as soon as the watermark proves slot 3 decided, while
    // the stream is still running (delay 0s so the watermark tracks max ts)
    val input = MemoryStream[(Long, Long, Long, Long, Long)]
    val q = StreamingVad.segments(
        input.toDS()
          .toDF("media_id", "window_id", "active", "sq_sum", "us")
          .select(col("media_id"), col("window_id"), col("active"),
            col("sq_sum"), timestamp_micros(col("us")).as("ts")),
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("vad_incr")
      .outputMode("append").start()
    try {
      def win(w: Long, a: Long) =
        (7L, w, a, if (a == 1) 80000000L else 0L, BaseUs + w * StepUs)
      input.addData(win(0, 1), win(1, 1), win(2, 0), win(3, 0))
      q.processAllAvailable()
      // a later window advances the watermark past slot 4 → run [0,1]
      // becomes decidable and emits NOW, with the clip still open
      input.addData(win(10, 0)); q.processAllAvailable()
      input.addData(win(11, 0)); q.processAllAvailable()
      val mid = spark.table("vad_incr").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      assert(mid.toSeq == Seq((0L, 1L, 2L)),
        s"segment did not finalize mid-stream: ${mid.toSeq}")
    } finally q.stop()
  }
}
