package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming chunk-ledger ingest contract (the StreamingNearDupSpec
  * discipline for the CDC leg):
  *  - batch⇄stream parity: replaying a corpus through the foreachBatch
  *    stage — one batch or several, in doc_id order — yields exactly the
  *    one-shot [[StreamingChunkLedger.batchTwin]] survivor set
  *    (micro-batch-boundary invariance);
  *  - re-fetches die: a page re-arriving with mostly-banked bytes is
  *    dropped even when its witness was itself dropped earlier (the
  *    ledger banks dropped docs' chunks too);
  *  - fresh content survives: a doc sharing a minority of its bytes
  *    passes;
  *  - the end-to-end streaming query (file source → ingest) lands the
  *    twin survivors and a distinct-row ledger. */
class StreamingChunkLedgerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** testdata head + re-fetches: doc i re-arrives as 10000+i with
    * identical text (an exact recrawl — every chunk banked), and 20000+i
    * carries a SHORT novel prefix plus the original text (boilerplate
    * re-wrap: mostly duplicate bytes). */
  private def corpus(): DataFrame = {
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val refetch = docs.filter(col("doc_id") < 8)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val rewrap = docs.filter(col("doc_id") < 8)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(lit("hdr "), col("text")).as("text"))
    docs.unionByName(refetch).unionByName(rewrap)
  }

  private def survivors(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  private def twinSet(c: DataFrame): Set[Long] =
    StreamingChunkLedger.batchTwin(c)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("survivor set is micro-batch-boundary invariant and equals the batch twin") {
    val c = corpus()
    val expected = twinSet(c)
    // teeth: originals survive, exact re-fetches die
    assert((0L until 8L).forall(expected.contains))
    assert((10000L until 10008L).forall(i => !expected.contains(i)),
      s"exact re-fetches must be ledger-dropped (got $expected)")

    // one shot
    val r1 = Files.createTempDirectory("graft-chunkled1").toString
    StreamingChunkLedger.chunkBatch(c, s"$r1/out", s"$r1/ledger")
    assert(survivors(s"$r1/out") == expected)

    // three batches split by id (in-order replay)
    val r2 = Files.createTempDirectory("graft-chunkled2").toString
    StreamingChunkLedger.chunkBatch(
      c.filter(col("doc_id") < 20), s"$r2/out", s"$r2/ledger")
    StreamingChunkLedger.chunkBatch(
      c.filter(col("doc_id") >= 20 && col("doc_id") < 10000),
      s"$r2/out", s"$r2/ledger")
    StreamingChunkLedger.chunkBatch(
      c.filter(col("doc_id") >= 10000), s"$r2/out", s"$r2/ledger")
    assert(survivors(s"$r2/out") == expected)
  }

  test("a witness dropped in an earlier batch still suppresses a later re-fetch") {
    import spark.implicits._
    // a: original page. b: exact re-fetch of a (dropped). c: re-fetch of
    // b — its only witnesses are a/b chunks, banked regardless of b's fate
    val page = (1 to 64).map(i => f"w$i%03d").mkString(" ")
    val r = Files.createTempDirectory("graft-chunkled3").toString
    StreamingChunkLedger.chunkBatch(
      Seq((1L, page)).toDF("doc_id", "text"), s"$r/out", s"$r/ledger")
    StreamingChunkLedger.chunkBatch(
      Seq((2L, page)).toDF("doc_id", "text"), s"$r/out", s"$r/ledger")
    StreamingChunkLedger.chunkBatch(
      Seq((3L, page)).toDF("doc_id", "text"), s"$r/out", s"$r/ledger")
    assert(survivors(s"$r/out") == Set(1L))
    // the ledger holds DISTINCT chunk hashes: three identical pages,
    // one row set
    val led = spark.read.parquet(s"$r/ledger")
    assert(led.count() == led.select("chunk_md5").distinct().count())
  }

  test("fresh content survives next to the ledger") {
    import spark.implicits._
    val a = (1 to 64).map(i => f"w$i%03d").mkString(" ")
    val fresh = (1 to 64).map(i => f"x$i%03d").mkString(" ")
    val r = Files.createTempDirectory("graft-chunkled4").toString
    StreamingChunkLedger.chunkBatch(
      Seq((1L, a)).toDF("doc_id", "text"), s"$r/out", s"$r/ledger")
    StreamingChunkLedger.chunkBatch(
      Seq((2L, fresh)).toDF("doc_id", "text"), s"$r/out", s"$r/ledger")
    assert(survivors(s"$r/out") == Set(1L, 2L))
  }

  test("end-to-end streaming query: file source -> ingest lands twin survivors") {
    val root = Files.createTempDirectory("graft-chunkled-e2e").toString
    val c = corpus()
    c.coalesce(1).write.parquet(s"$root/in")
    val stream = spark.readStream.schema(c.schema).parquet(s"$root/in")
    val q = StreamingChunkLedger.ingest(
      stream, s"$root/out", s"$root/ledger", s"$root/ckpt")
    q.awaitTermination(120000)
    assert(survivors(s"$root/out") == twinSet(c))
    // ledger rows stay distinct across appends
    val led = spark.read.parquet(s"$root/ledger")
    assert(led.count() == led.select("chunk_md5").distinct().count())
  }
}
