package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming model serving — the continuous leg of the ML loop the
  * catalog already gates in batch: q116 trains, ModelStore persists,
  * q120 serves a table, and THIS stage serves an unbounded document
  * stream with the SAME weights through the SAME projection
  * ([[graft.ml.MlQueries.scoreWith]] — parity across the inline,
  * persisted, and streaming paths is by shared definition, the
  * StreamingBronze/Silver rationale applied to inference).
  *
  * Shape: scoring is a STATELESS narrow projection (the model rides in
  * as literals), so the stream needs no state store, no watermark, and
  * no shuffle — per micro-batch cost is exactly the q117 scan cost of
  * that batch, the correct serving posture at any scale.
  *
  * Observability (`observed = true`): per-micro-batch score telemetry
  * piggybacks on the pass the projection already makes via `observe`
  * (zero extra scans — the Audit.observed / doc_ingest rationale):
  *   n_scored          rows scored this batch
  *   n_pred_pos        positive decisions this batch
  *   score_micro_sum   exact BIGINT sum of micro-unit scores
  * A drifting positive-rate (n_pred_pos/n_scored) or mean score
  * (score_micro_sum/1e6/n_scored) against the training baseline is the
  * standard online signal for input drift — the serving-side companion
  * of q133's offline PSI. Sums are exact integers, so cross-batch
  * aggregation by the sink is drift-free.
  */
object StreamingScore {

  /** Score a (doc_id, text, lang, n_chars) stream with a trained weight
    * vector (bias :: x1 :: x2 :: x3, the q116 model). Output matches
    * q117/q120: (doc_id, p_en, pred_en, is_en). */
  def serve(docs: DataFrame, w: Array[Double],
      observed: Boolean = true): DataFrame = {
    val scored = graft.ml.MlQueries.scoreWith(docs, w)
    if (observed) scored.observe("score_monitor",
      count(lit(1)).as("n_scored"),
      sum(col("pred_en")).as("n_pred_pos"),
      sum(round(col("p_en") * 1e6).cast("long")).as("score_micro_sum"))
    else scored
  }

  /** Conformal serving — [[serve]] plus the q180 prediction-set stage
    * (shared verbatim: [[graft.ml.MlQueries.conformalSets]]), with the
    * calibrated micro-unit threshold riding in as ONE literal the way
    * the weights do. Still stateless: set membership is two integer
    * compares per row, so the stream needs no state store and batch ==
    * stream row-for-row by construction.
    *
    * Telemetry (`observed = true`, "conformal_monitor"): the selective-
    * prediction signals a serving gate watches —
    *   n_empty      set_size 0: the model REJECTS both labels (flag for
    *                human review / drift alarm; rate should be ~0)
    *   n_singleton  confident single-label decisions
    *   n_full       both labels plausible (abstain-or-escalate zone)
    *   n_covered    true label in set (only meaningful under shadow
    *                labels; at 0.9 calibration it tracks ~90%)
    * A rising n_full or n_empty rate against the calibration baseline
    * is distribution shift the conformal guarantee is ABOUT — this is
    * the online companion of q180's batch gate. */
  def serveConformal(docs: DataFrame, w: Array[Double], qhatU: Long,
      observed: Boolean = true): DataFrame = {
    val scored = graft.ml.MlQueries.scoreWith(docs, w)
      .withColumn("p_u", round(col("p_en") * 1e6).cast("long"))
    val sets = graft.ml.MlQueries.conformalSets(scored, lit(qhatU))
    if (observed) sets.observe("conformal_monitor",
      count(lit(1)).as("n_scored"),
      sum(when(col("set_size") === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(when(col("set_size") === 1, 1L).otherwise(0L)).as("n_singleton"),
      sum(when(col("set_size") === 2, 1L).otherwise(0L)).as("n_full"),
      sum(col("covered")).as("n_covered"))
    else sets
  }
}
