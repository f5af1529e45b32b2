package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.SubstrIndex

/** Streaming ExactSubstr ingest contract (the probe-then-append order
  * [[SubstrIndex]]'s scaladoc contracts):
  *  - batch-boundary invariance: replaying the q251 delta corpus through
  *    [[StreamingSubstrIngest.substrBatch]] in ONE batch or split across
  *    several (doc_id-ordered) yields exactly the one-shot q251 rows;
  *  - at-least-once replay safety (ADVICE r13): a replayed batch —
  *    committed or partially committed (its text already landed, its
  *    windows already in the index) — neither self-matches to full
  *    coverage nor duplicates coverage/landed rows;
  *  - the real streaming query (file source → substrIngest, checkpoint
  *    restart between waves) lands the same coverage rows. */
class StreamingSubstrIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def split() = {
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .withColumn("is_delta",
        substring(md5(col("doc_id").cast("string")), 1, 2) <= "19")
    (docs.filter(!col("is_delta")).select("doc_id", "text"),
      docs.filter(col("is_delta")).select("doc_id", "text"))
  }

  private def rowsOf(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "n_tokens", "n_dup_tokens", "n_kept_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def cov(covOut: String): Set[(Long, Long, Long, Long)] =
    rowsOf(StreamingSubstrIngest.coverage(spark, covOut))

  private def expected(): Set[(Long, Long, Long, Long)] =
    rowsOf(graft.SparkEntry.queries("q251_exact_substr_incremental")(spark, sf))

  private def withIndex[T](name: String)(body: => T): T =
    try body finally spark.sql(s"DROP TABLE IF EXISTS ${name}_windows")

  test("one-batch replay equals one-shot q251") {
    val (base, delta) = split()
    val exp = expected()
    assert(exp.nonEmpty)
    withIndex("ssing1") {
      val r = Files.createTempDirectory("graft-ssub1").toString
      SubstrIndex.build(base, "ssing1")
      base.write.parquet(s"$r/landed")
      StreamingSubstrIngest.substrBatch(delta, 0L, "ssing1",
        s"$r/landed", s"$r/cov")
      assert(cov(s"$r/cov") == exp)
    }
  }

  test("two doc_id-ordered batches equal one-shot q251 " +
    "(cross-batch earlier-ness carried by the index)") {
    val (base, delta) = split()
    val exp = expected()
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    withIndex("ssing2") {
      val r = Files.createTempDirectory("graft-ssub2").toString
      SubstrIndex.build(base, "ssing2")
      base.write.parquet(s"$r/landed")
      StreamingSubstrIngest.substrBatch(delta.filter(col("doc_id") < mid),
        0L, "ssing2", s"$r/landed", s"$r/cov")
      StreamingSubstrIngest.substrBatch(delta.filter(col("doc_id") >= mid),
        1L, "ssing2", s"$r/landed", s"$r/cov")
      assert(cov(s"$r/cov") == exp)
    }
  }

  test("at-least-once replay is safe: committed batches no-op; a " +
    "partially-committed batch (landed + indexed, ledger missing) " +
    "never finds itself (ADVICE r13)") {
    val (base, delta) = split()
    val exp = expected()
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    withIndex("ssing4") {
      val r = Files.createTempDirectory("graft-ssub4").toString
      SubstrIndex.build(base, "ssing4")
      base.write.parquet(s"$r/landed")
      val b0 = delta.filter(col("doc_id") < mid)
      val b1 = delta.filter(col("doc_id") >= mid)
      StreamingSubstrIngest.substrBatch(b0, 0L, "ssing4",
        s"$r/landed", s"$r/cov")
      StreamingSubstrIngest.substrBatch(b1, 1L, "ssing4",
        s"$r/landed", s"$r/cov")
      assert(cov(s"$r/cov") == exp)
      // full replay of committed batches: pure no-op (the old form
      // self-matched batch 0 against its own landed text + index rows
      // and duplicated every cov row)
      StreamingSubstrIngest.substrBatch(b0, 0L, "ssing4",
        s"$r/landed", s"$r/cov")
      StreamingSubstrIngest.substrBatch(b1, 1L, "ssing4",
        s"$r/landed", s"$r/cov")
      assert(cov(s"$r/cov") == exp, "committed replay must be a no-op")
      // partial-commit crash: batch 1 landed its text AND appended its
      // windows but died before the ledger write — simulate by removing
      // the ledger marker, then replay. The probe must not let batch 1
      // find its own landed/indexed copy (full self-coverage), and the
      // coverage rows must not duplicate.
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
      }
      rmrf(new java.io.File(s"$r/cov_ledger/b1"))
      StreamingSubstrIngest.substrBatch(b1, 1L, "ssing4",
        s"$r/landed", s"$r/cov")
      assert(cov(s"$r/cov") == exp,
        "partial-commit replay must reproduce the exact coverage rows")
      // the landed corpus must hold each delta doc exactly once
      val landedCnt = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$r/landed").groupBy("doc_id").count()
        .filter(col("count") > 1).count()
      assert(landedCnt == 0, "no doc may land twice across replays")
    }
  }

  test("file-source streaming query with checkpoint restart lands the same rows") {
    val (base, delta) = split()
    val exp = expected()
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    withIndex("ssing3") {
      val r = Files.createTempDirectory("graft-ssub3").toString
      SubstrIndex.build(base, "ssing3")
      base.write.parquet(s"$r/landed")
      val schema = delta.schema
      // wave 1: first half arrives, AvailableNow drains it
      delta.filter(col("doc_id") < mid).write.parquet(s"$r/feed")
      def wave(): Unit = {
        val q = StreamingSubstrIngest.substrIngest(
          spark.readStream.schema(schema).parquet(s"$r/feed"),
          "ssing3", s"$r/landed", s"$r/cov", s"$r/chk")
        q.awaitTermination()
      }
      wave()
      // wave 2: second half arrives; the restarted query (same
      // checkpoint) processes ONLY the new files
      delta.filter(col("doc_id") >= mid).write.mode("append")
        .parquet(s"$r/feed")
      wave()
      assert(cov(s"$r/cov") == exp)
    }
  }
}
