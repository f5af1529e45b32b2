package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Expectations

/** Continuous data-quality monitoring — the streaming twin of
  * [[graft.operators.Expectations]]: every micro-batch is scored against
  * the declared rule suite and the per-rule report rows (keyed by
  * batch_id) append to a parquet DQ log. This is the rule-driven
  * generalization of [[StreamingDocIngest.observedPipeline]]'s hardcoded
  * drop-rate metrics: the suite is DATA (a Seq of rules), so ops can
  * tighten a threshold without touching the stream topology.
  *
  * Scope note: rules score PER BATCH — `Unique` means "unique within the
  * micro-batch" (cross-batch uniqueness is [[graft.operators.Upsert]]'s
  * latest-wins job or a stateful dedup, not a scan-level rule). Per-batch
  * violation counts are exactly what a drift monitor wants: a batch whose
  * in_set violation rate jumps signals an upstream format change NOW,
  * not averaged into history.
  *
  * Delivery: foreachBatch is at-least-once on replay; report rows for a
  * replayed batch are BYTE-IDENTICAL (the suite is deterministic per
  * batch), so [[readReports]] collapses replays with a dropDuplicates on
  * (batch_id, rule, target) — exactly-once-effective without a
  * transactional sink. At 100 TB the log grows by O(rules) rows per
  * batch — nothing; the scored batch itself is one pruned pass, the
  * [[Expectations]] single-scan contract.
  */
object StreamingExpectations {

  /** Score one micro-batch and append its report to the log. Public so
    * recovery tooling and specs drive the exact sink path. */
  def applyBatch(batch: DataFrame, batchId: Long,
      rules: Seq[Expectations.Rule], reportDest: String): Unit = {
    if (batch.isEmpty) return
    Expectations.check(batch, rules)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").option("compression", "snappy")
      .parquet(reportDest)
  }

  /** Start continuous scoring of `stream` against `rules`, appending
    * per-batch reports to `reportDest`. The stream itself passes through
    * unconsumed by anything else — run this as a side monitor on the
    * same source, or fold [[applyBatch]] into an existing foreachBatch
    * sink to score exactly what lands. */
  def monitor(stream: DataFrame, rules: Seq[Expectations.Rule],
      reportDest: String, checkpoint: String): StreamingQuery = {
    require(rules.nonEmpty, "empty expectation suite")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, rules, reportDest)
      }
      .start()
  }

  /** The DQ log with at-least-once replays collapsed: one row per
    * (batch_id, rule, target). */
  def readReports(spark: SparkSession, reportDest: String): DataFrame =
    spark.read.parquet(reportDest)
      .dropDuplicates("batch_id", "rule", "target")

  /** Batches whose violation share of `rule` on `target` is at or above
    * `maxShare` — the paging signal. */
  def breaches(spark: SparkSession, reportDest: String, rule: String,
      target: String, maxShare: Double): DataFrame =
    readReports(spark, reportDest)
      .filter(col("rule") === rule && col("target") === target &&
        col("n_violations").cast("double") >= col("n_rows") * maxShare)
      .select("batch_id", "rule", "target", "n_violations", "n_rows")
}
