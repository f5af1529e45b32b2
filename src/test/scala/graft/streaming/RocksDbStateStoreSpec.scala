package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB state-store posture: the default HDFS-backed provider holds
  * every key in executor HEAP — a continuous dedup/sessionization stream
  * whose in-watermark key set outgrows memory simply dies. RocksDB keeps
  * state off-heap with disk spill and incremental checkpoints; SCALE.md
  * prescribes it for any production stream. This spec proves the graft
  * streaming operators run UNCHANGED on the RocksDB provider and produce
  * the same results — the provider is a config, not a code change. */
class RocksDbStateStoreSpec extends SparkSpec {

  private val T0 = 1700000000000000L
  private val Min = 60L * 1000000

  private val goodText = ("the quick brown fox jumps over the lazy dog and " +
    "runs of the hill with a bag of corn ") * 2

  test("doc-ingest dedup state runs on RocksDB with identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String, Long)]
      val docs = input.toDS().toDF("doc_id", "text", "us")
        .select(col("doc_id"), col("text"),
          timestamp_micros(col("us")).as("ingest_ts"))
      val q = StreamingDocIngest.pipeline(docs)
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        input.addData(
          (1L, goodText, T0),
          (2L, goodText + " ", T0 + Min), // same normalized fp -> dup
          (3L, goodText + "unique tail", T0 + 2 * Min))
        q.processAllAvailable()
        // the query genuinely ran on RocksDB, not a silent fallback
        val provider = q.lastProgress.stateOperators.headOption
          .map(_.customMetrics.keySet().toString).getOrElse("")
        assert(provider.contains("rocksdb"),
          s"no rocksdb metrics in state operator (fell back?): $provider")
        val out = spark.table("rocks_out").select("doc_id")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(out == Seq(1L, 3L), s"RocksDB run diverged: $out")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
