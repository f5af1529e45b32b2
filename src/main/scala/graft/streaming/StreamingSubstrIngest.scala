package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.SubstrIndex

/** Streaming ExactSubstr ingest — the continuous counterpart of q251/q252,
  * completing the persisted-structure ingest family (postings, IVF cells,
  * set-sim prefixes all ride [[StreamingDocIngest.indexedIngest]]; the
  * window-hash index rides here): an unbounded document feed where each
  * micro-batch's positions are scored against everything that arrived
  * BEFORE them — the standing indexed corpus plus earlier rows of the
  * same batch — then the batch itself becomes standing corpus.
  *
  * Per micro-batch, in the order [[SubstrIndex]]'s scaladoc contracts
  * (PROBE BEFORE APPEND — a doc must never find itself in the index):
  *  1. probe: per-doc ExactSubstr coverage of the batch against the
  *     standing index (verification reads the landed corpus text) plus
  *     within-batch earlier occurrences — exact, source-backed;
  *  2. land: the batch text appends to the landed-corpus store (the
  *     source store later probes' verification reads);
  *  3. append: the batch's window hashes append to the bucketed index
  *     (content-pure hashing ⇒ append+probe == rebuild+probe exactly).
  *
  * CONTRACT: the index and the landed store must already exist — build
  * them over the base corpus with [[SubstrIndex.build]] + a parquet write
  * before starting the stream (the VectorIndex posture: building a
  * standing structure is an explicit decision, never an ingest side
  * effect; a missing table fails loudly here).
  *
  * Batch-boundary invariance (StreamingSubstrIngestSpec pins it): when
  * docs arrive in doc_id order, 1-batch == n-batch == the one-shot q251
  * semantics, because "indexed before" and "lower doc_id" coincide —
  * cross-batch earlier-ness is carried by the index, within-batch by the
  * probe's delta-self join.
  *
  * Scale posture: each batch hashes only its OWN windows (delta-sized);
  * the index side of the candidate join is a bucketed exchange-free scan;
  * coverage is the island-mass interval union; driver state is nil. */
object StreamingSubstrIngest {

  /** foreachBatch body — probe, land, append (in that order). */
  private[graft] def substrBatch(batch: DataFrame, indexName: String,
      landedDir: String, covOut: String): Unit = {
    val s = batch.sparkSession
    val docs = batch.select("doc_id", "text").persist()
    try {
      val corpus = s.read.parquet(landedDir).select("doc_id", "text")
      SubstrIndex.probe(s, indexName, docs, corpus)
        .write.mode("append").parquet(covOut)
      docs.write.mode("append").parquet(landedDir)
      SubstrIndex.append(docs, indexName)
    } finally docs.unpersist()
  }

  /** Wire a (doc_id, text, ...) stream through [[substrBatch]]. */
  def substrIngest(docs: DataFrame, indexName: String, landedDir: String,
      covOut: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        substrBatch(batch, indexName, landedDir, covOut)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
