package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming block packing contract: the blocks view is micro-batch-
  * boundary invariant (1-wave == n-wave == one-shot packing of the
  * concatenated corpus), including waves that split a 512-token block
  * mid-way — the cursor seam's whole job — and batch commits are
  * idempotent under at-least-once replay (ADVICE r13): a replayed
  * batch, committed or partially committed, never double-counts a
  * block contribution or double-advances the cursor. */
class StreamingPackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val merges =
    graft.text.TextQueries.trainByteBpeMerges(spark, sf, 3)

  private def corpus(): DataFrame =
    graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 120)

  /** One-shot expected blocks: same helpers, no cursor. */
  private def expected(): Set[(Long, Long, Long)] = {
    val perdoc = graft.text.TextQueries.byteBpeDocTokens(corpus(), merges)
    graft.operators.GlobalOrder
      .withRunningTotals(perdoc, Seq(col("doc_id")), col("n_tokens"))
      .withColumn("block_id",
        explode(sequence(expr("tstart div 512"), expr("(tend - 1) div 512"))))
      .groupBy("block_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("tend"), (col("block_id") + 1) * 512L) -
          greatest(col("tstart"), col("block_id") * 512L))
          .as("block_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def view(root: String): Set[(Long, Long, Long)] =
    StreamingPackIngest.blocks(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("one wave equals the one-shot packing") {
    val r = Files.createTempDirectory("graft-pack1").toString
    StreamingPackIngest.packBatch(corpus(), 0L, merges, r)
    assert(view(r) == expected())
  }

  test("three doc_id-ordered waves equal the one-shot packing, and a " +
    "boundary-split block merges from multiple contributions") {
    val c = corpus()
    val r = Files.createTempDirectory("graft-pack3").toString
    StreamingPackIngest.packBatch(c.filter(col("doc_id") < 7), 0L, merges, r)
    StreamingPackIngest.packBatch(
      c.filter(col("doc_id") >= 7 && col("doc_id") < 50), 1L, merges, r)
    StreamingPackIngest.packBatch(c.filter(col("doc_id") >= 50), 2L, merges, r)
    assert(view(r) == expected())
    // the first wave (6 docs) almost surely ends mid-block: its last
    // block_id must carry a second contribution row from wave 2
    val contribs = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$r/blocks")
      .groupBy("block_id").agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1).count()
    assert(contribs > 0, "no block was split across waves — split teeth lost")
  }

  test("replay of a COMMITTED batch is a no-op; replay of a PARTIALLY " +
    "committed batch reproduces identical state (ADVICE r13)") {
    val c = corpus()
    val b0 = c.filter(col("doc_id") < 50)
    val b1 = c.filter(col("doc_id") >= 50)
    val r = Files.createTempDirectory("graft-packr").toString
    StreamingPackIngest.packBatch(b0, 0L, merges, r)
    StreamingPackIngest.packBatch(b1, 1L, merges, r)
    val exp = expected()
    assert(view(r) == exp)
    // full replay of both batches (at-least-once delivery): no change —
    // the old append form double-counted every block and doubled the
    // cursor here
    StreamingPackIngest.packBatch(b0, 0L, merges, r)
    StreamingPackIngest.packBatch(b1, 1L, merges, r)
    assert(view(r) == exp, "replaying committed batches must be a no-op")
    // partial-commit replay: simulate a crash BETWEEN the blocks write
    // and the cursor write of batch 1 by deleting its cursor dir, then
    // replay — the rerun must reproduce the exact same blocks and
    // re-commit the same cursor (no shifted boundaries, no duplicates)
    val cur1 = new java.io.File(s"$r/cursor/b1")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    rmrf(cur1)
    StreamingPackIngest.packBatch(b1, 1L, merges, r)
    assert(view(r) == exp, "partial-commit replay must converge exactly")
    // and the cursor sums to the one-shot token total, exactly once
    val totTokens = graft.text.TextQueries.byteBpeDocTokens(c, merges)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val cursorSum = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$r/cursor").agg(sum("n")).collect()(0).getLong(0)
    assert(cursorSum == totTokens,
      s"cursor must advance exactly once per batch: $cursorSum vs $totTokens")
  }

  test("packing normalizes NFC, mirroring the batch flagship (ADVICE r13)") {
    import spark.implicits._
    // U+FB01 (LATIN SMALL LIGATURE FI) survives NFC (3 UTF-8 bytes) but
    // NFKC-expands to "fi" (2 bytes) — with no merges, n_tokens is the
    // byte count, so the normalization choice is directly observable
    val doc = Seq((1L, "ﬁle")).toDF("doc_id", "text")
    val n = graft.text.TextQueries.byteBpeDocTokens(doc, Nil)
      .collect()(0).getAs[Long]("n_tokens")
    assert(n == 5L, s"NFC keeps the ligature: 3+1+1 byte symbols, got $n")
  }

  test("file-source streaming query with checkpoint restart lands the same view") {
    val c = corpus()
    val r = Files.createTempDirectory("graft-packq").toString
    val schema = c.schema
    c.filter(col("doc_id") < 60).write.parquet(s"$r/feed")
    def wave(): Unit =
      StreamingPackIngest.packIngest(
        spark.readStream.schema(schema).parquet(s"$r/feed"),
        merges, s"$r/out", s"$r/chk").awaitTermination()
    wave()
    c.filter(col("doc_id") >= 60).write.mode("append").parquet(s"$r/feed")
    wave()
    assert(view(s"$r/out") == expected())
  }
}
