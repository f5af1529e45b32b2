package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming block packing contract: the blocks view is micro-batch-
  * boundary invariant (1-wave == n-wave == one-shot packing of the
  * concatenated corpus), including waves that split a 512-token block
  * mid-way — the cursor seam's whole job. */
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
    StreamingPackIngest.packBatch(corpus(), merges, r)
    assert(view(r) == expected())
  }

  test("three doc_id-ordered waves equal the one-shot packing, and a " +
    "boundary-split block merges from multiple contributions") {
    val c = corpus()
    val r = Files.createTempDirectory("graft-pack3").toString
    StreamingPackIngest.packBatch(c.filter(col("doc_id") < 7), merges, r)
    StreamingPackIngest.packBatch(
      c.filter(col("doc_id") >= 7 && col("doc_id") < 50), merges, r)
    StreamingPackIngest.packBatch(c.filter(col("doc_id") >= 50), merges, r)
    assert(view(r) == expected())
    // the first wave (6 docs) almost surely ends mid-block: its last
    // block_id must carry a second contribution row from wave 2
    val contribs = spark.read.parquet(s"$r/blocks")
      .groupBy("block_id").agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1).count()
    assert(contribs > 0, "no block was split across waves — split teeth lost")
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
