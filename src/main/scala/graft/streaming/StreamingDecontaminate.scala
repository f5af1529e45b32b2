package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming eval-set decontamination — q203's ingest-time member of the
  * curation stream family (quality gate / near-dup ingest / doc quality
  * monitors): every incoming micro-batch of (doc_id, text) is annotated
  * with the q203 verdict against a FIXED eval gram set and appended to a
  * verdict log; a training pipeline consumes the `dropped = 0` slice.
  *
  * Parity posture (the StreamingScore pattern): the stage is STATELESS —
  * the eval set is a static table built once
  * ([[buildEvalGrams]]), each batch joins it independently, and the
  * per-batch computation is the verbatim shared
  * `DedupQueries.decontaminateAgainst`, so stream == batch q203
  * row-for-row BY SHARED DEFINITION (StreamingDecontaminateSpec replays
  * the corpus and compares against the batch query across micro-batch
  * splits). At scale the eval gram set is small (eval corpora are
  * thousands of docs) and broadcasts under AQE; the per-batch cost is the
  * batch's own gram explode — delta-proportional like every ingest stage.
  */
object StreamingDecontaminate {

  /** Materialize the eval-side distinct gram set once (the build-time
    * artifact the stream probes; rebuild when the eval suite changes). */
  def buildEvalGrams(evalDocs: DataFrame, path: String): Unit =
    graft.dedup.DedupQueries.evalGramSetOf(evalDocs)
      .write.mode("overwrite").parquet(path)

  /** Annotate a static or foreachBatch frame — the shared q203 stage. */
  def annotate(spark: SparkSession, docs: DataFrame,
      evalGramsPath: String): DataFrame =
    graft.dedup.DedupQueries.decontaminateAgainst(docs,
      spark.read.parquet(evalGramsPath))

  /** Stream (doc_id, text) → append q203 verdict rows to `outPath`. */
  def ingest(docs: DataFrame, evalGramsPath: String, outPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        annotate(batch.sparkSession, batch, evalGramsPath)
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
