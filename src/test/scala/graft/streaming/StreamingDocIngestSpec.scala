package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextSignals

/** Streaming document ingest: the quality gate must agree with the batch
  * q31 score (shared TextSignals definition), exact dedup must drop
  * fingerprint-duplicates inside the watermark, and state must be bounded
  * by the watermark (dups arriving after the horizon are NOT suppressed —
  * that's the documented state-size contract, handled downstream by the
  * batch dedup pass). */
class StreamingDocIngestSpec extends SparkSpec {

  private val T0 = 1700000000000000L // µs anchor
  private val Min = 60L * 1000000

  // ~40 tokens, >100 chars, stopword-rich -> quality 1.0
  private val goodText = ("the quick brown fox jumps over the lazy dog and " +
    "runs of the hill with a bag of corn ") * 2
  private val shortText = "too short" // fails length AND stopword gates -> 0.0

  private def stream() = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDS().toDF("doc_id", "text", "us")
      .select(col("doc_id"), col("text"), timestamp_micros(col("us")).as("ingest_ts"))
    (input, docs)
  }

  test("quality gate matches batch q31 semantics and dups dedup within watermark") {
    val (input, docs) = stream()
    val q = StreamingDocIngest.pipeline(docs)
      .writeStream.format("memory").queryName("docs_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, goodText, T0),                    // passes, first copy
        (2L, goodText + " ", T0 + Min),        // same normalized fp -> dup
        (3L, shortText, T0 + Min),             // quality 0.0 -> gated out
        (4L, goodText + "unique tail", T0 + 2 * Min)) // distinct fp, passes
      q.processAllAvailable()
      val out = spark.table("docs_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out == Seq(1L, 4L), s"expected docs 1,4; got $out")
      // the surviving score agrees with the batch expression by definition
      val scores = spark.table("docs_out").select("quality_score")
        .collect().map(_.getDouble(0)).toSet
      assert(scores == Set(1.0))
    } finally q.stop()
  }

  test("dedup state is watermark-bounded: late re-arrival past the horizon passes") {
    val (input, docs) = stream()
    val q = StreamingDocIngest.pipeline(docs, watermark = "5 minutes")
      .writeStream.format("memory").queryName("docs_out2")
      .outputMode("append").start()
    try {
      input.addData((1L, goodText, T0))
      q.processAllAvailable()
      // advance the watermark far past T0 + 5 min, expiring doc 1's fp state
      input.addData((2L, goodText + "unique tail", T0 + 60 * Min))
      q.processAllAvailable()
      // same fingerprint as doc 1, arriving after its state expired
      input.addData((3L, goodText, T0 + 61 * Min))
      q.processAllAvailable()
      val out = spark.table("docs_out2").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out == Seq(1L, 2L, 3L),
        s"state should expire with the watermark (got $out)")
    } finally q.stop()
  }

  test("writeDocs lands the cleaned stream as parquet, checkpointed") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-docingest").toString
    val (input, docs) = stream()
    input.addData((1L, goodText, T0), (2L, goodText, T0 + Min), // dup of 1
      (3L, shortText, T0 + Min))                                // gated
    val q = StreamingDocIngest.writeDocs(
      StreamingDocIngest.pipeline(docs), s"$root/clean", s"$root/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$root/clean")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.columns.contains("quality_score") && out.columns.contains("fp"))
  }

  test("batch/stream parity: the gate uses the very expression q31 serves") {
    import spark.implicits._
    val df = Seq((1L, goodText), (2L, shortText)).toDF("doc_id", "text")
    val scores = df.select(col("doc_id"),
      TextSignals.qualityScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores == Map(1L -> 1.0, 2L -> 0.0))
  }

  test("observedPipeline reports per-batch input and quality-drop counts") {
    val (input, docs) = stream()
    val q = StreamingDocIngest.observedPipeline(docs)
      .writeStream.format("memory").queryName("docs_obs")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, goodText, T0),              // passes
        (2L, shortText, T0 + Min),       // quality-dropped
        (3L, shortText + "!", T0 + Min), // quality-dropped
        (4L, null, T0 + Min)             // NULL text: score is NULL — the
        // gate drops it, and the drop COUNT must include it (counting
        // `score < min` would miss NULLs and under-report the drop rate)
      )
      q.processAllAvailable()
      // sum the observed metrics across all progress entries (empty
      // trailing batches carry no "doc_ingest" entry)
      var nIn = 0L; var nDropped = 0L
      q.recentProgress.foreach { p =>
        val m = p.observedMetrics
        if (m.containsKey("doc_ingest")) {
          val row = m.get("doc_ingest")
          nIn += row.getAs[Long]("n_in")
          nDropped += row.getAs[Long]("n_quality_dropped")
        }
      }
      assert(nIn == 4L, s"observed n_in=$nIn, want 4")
      assert(nDropped == 3L, s"observed n_quality_dropped=$nDropped, want 3")
      // and the gate itself still behaves identically to pipeline()
      val out = spark.table("docs_obs").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out == Seq(1L))
    } finally q.stop()
  }
}
