package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming training-block packing — the continuous form of q94/q253's
  * final stage: an unbounded curated-doc feed is byte-BPE encoded under
  * a FROZEN tokenizer and cut into fixed B-token blocks that cross BOTH
  * document and micro-batch boundaries, exactly as a one-shot pack of
  * the concatenated corpus would cut them.
  *
  * The cross-batch seam is a persistent TOKEN CURSOR: an append-only
  * one-column ledger whose sum is the total token count packed so far.
  * Each batch computes its per-doc token counts (vocab-sized merge
  * application — [[graft.text.TextQueries.byteBpeDocTokens]]), assigns
  * global offsets with the q89/q94 two-pass machinery SHIFTED by the
  * cursor, appends per-block CONTRIBUTIONS (block_id, n_docs,
  * block_tokens) — a block split by a batch boundary simply receives two
  * contribution rows — and appends the batch's token total to the
  * cursor. The served [[blocks]] view aggregates contributions, so
  * 1-wave == n-wave == one-shot BY CONSTRUCTION when docs arrive in
  * doc_id order (StreamingPackSpec pins it, including a mid-block wave
  * split).
  *
  * Scale posture: per batch — one vocab-sized merge apply, one
  * delta-sized offset pass (range partition + broadcast offsets, never
  * a single-partition window), one block-keyed agg; driver state is the
  * cursor SUM (one long). The blocks table is append-only and compacts
  * by re-aggregation at read, the q66 shard-manifest posture. */
object StreamingPackIngest {

  private val CursorSchema = StructType(Seq(StructField("n", LongType)))

  /** foreachBatch body: pack one micro-batch of (doc_id, text) docs. */
  private[graft] def packBatch(batch: DataFrame,
      merges: Seq[(Long, String, Long)], outRoot: String,
      blockTokens: Long = 512L): Unit = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val s = batch.sparkSession
    val perdoc = graft.text.TextQueries
      .byteBpeDocTokens(batch.select("doc_id", "text"), merges)
      .localCheckpoint(true) // feeds offsets AND the cursor total
    val cursor = LedgerIO.readOrEmpty(s, s"$outRoot/cursor", CursorSchema)
      .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
    val spans = graft.operators.GlobalOrder
      .withRunningTotals(perdoc, Seq(col("doc_id")), col("n_tokens"))
      .withColumn("tstart", col("tstart") + lit(cursor))
      .withColumn("tend", col("tend") + lit(cursor))
    spans
      .withColumn("block_id", explode(sequence(
        expr(s"tstart div ${blockTokens}L"),
        expr(s"(tend - 1) div ${blockTokens}L"))))
      .groupBy("block_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("tend"), (col("block_id") + 1) * blockTokens) -
          greatest(col("tstart"), col("block_id") * blockTokens))
          .as("block_tokens"))
      .write.mode("append").parquet(s"$outRoot/blocks")
    val total = perdoc.agg(coalesce(sum("n_tokens"), lit(0L)))
      .collect()(0).getLong(0)
    import s.implicits._
    Seq(total).toDF("n").write.mode("append").parquet(s"$outRoot/cursor")
  }

  /** The served view: per-block composition aggregated over all landed
    * contributions (a boundary-split block's rows merge here). */
  def blocks(spark: SparkSession, outRoot: String): DataFrame =
    spark.read.parquet(s"$outRoot/blocks")
      .groupBy("block_id")
      .agg(sum("n_docs").as("n_docs"),
        sum("block_tokens").as("block_tokens"))

  /** Wire a (doc_id, text, ...) stream through [[packBatch]]. */
  def packIngest(docs: DataFrame, merges: Seq[(Long, String, Long)],
      outRoot: String, checkpoint: String,
      blockTokens: Long = 512L): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        packBatch(batch, merges, outRoot, blockTokens)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
