package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Upsert

/** Streaming MERGE sink — continuous latest-wins upsert of a keyed update
  * stream into a partitioned parquet base, the CDC-apply shape every lake
  * runs: `readStream(changes) → foreachBatch(merge into base)`.
  *
  * Why foreachBatch and not a stateful operator: the base table is the
  * state, and it is exactly the thing a 100 TB deployment cannot hold in
  * stream state — [[graft.operators.Upsert.writeMerged]] instead bounds
  * every micro-batch to the partitions the batch touches (statically
  * pruned base scan, dynamic-partition overwrite, staging-dir
  * durability), so per-batch cost tracks batch footprint, not table size.
  *
  * Delivery semantics: foreachBatch is AT-LEAST-ONCE on failure replay —
  * exactly-once for this sink comes from the merge being IDEMPOTENT, not
  * from the transport. Replaying a delivered batch re-resolves the same
  * keys to the same winners (latest-wins with the deterministic B3
  * content-hash tiebreak) over a base that already contains them: the
  * rewrite is a byte-identical no-op. StreamingUpsertSpec pins replay ==
  * no-op and stream == one-shot batch merge.
  *
  * Single writer per dest (the Upsert contract) — one streaming query per
  * base table; parallelism lives inside each merge, not across writers. */
object StreamingUpsert {

  /** Apply one micro-batch. Public so replay/recovery tooling (and the
    * spec) can drive the exact merge the running sink performs. */
  def applyBatch(batch: DataFrame, dest: String, keyCols: Seq[String],
      orderCol: String, partCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val base = baseOrEmpty(spark, dest, batch)
    Upsert.writeMerged(base, batch, keyCols, orderCol, partCol, dest)
  }

  /** Start the continuous upsert of `updates` into `dest`. */
  def sink(updates: DataFrame, dest: String, keyCols: Seq[String],
      orderCol: String, partCol: String, checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, dest, keyCols, orderCol, partCol)
      }
      .start()

  /** The base table, or an empty frame with the batch's schema before the
    * first commit (dest not yet written). */
  private def baseOrEmpty(spark: SparkSession, dest: String,
      batch: DataFrame): DataFrame =
    // LedgerIO reads with the batch's explicit schema (already in batch-
    // column order, so unionByName sees aligned schemas) — a missing OR
    // exists-but-fileless dest degrades to empty instead of wedging
    // restarts on schema inference
    LedgerIO.readOrEmpty(spark, dest, batch.schema)
}
