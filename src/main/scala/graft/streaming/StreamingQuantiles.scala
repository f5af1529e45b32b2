package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.QuantileSketch

/** Per-source running quantile snapshot (one row per source per batch the
  * source appeared in; `n_docs` is the lifetime count behind the estimate,
  * so the latest snapshot per source is the one with the largest n). */
final case class SourceQuantiles(source: String, n_docs: Long,
    p50_chars: Double, p90_chars: Double, p99_chars: Double)

/** Streaming distribution monitor — the continuous twin of the q108 batch
  * rollup: a KLL(k) sketch per source carried in `mapGroupsWithState`
  * state, updated per micro-batch, emitting the current p50/p90/p99
  * doc-length snapshot in update mode. The production use is drift
  * detection: a source whose p99 length jumps between snapshots changed
  * its upstream format — the same incident signal as
  * [[StreamingDocIngest.observedPipeline]]'s drop rate, but for the
  * VALUE DISTRIBUTION rather than the drop count.
  *
  * Why a sketch in state and not `groupBy(source).agg(percentile(...))`:
  * exact streaming percentiles need every value retained in state
  * (unbounded); complete-mode re-aggregation rescans nothing but also
  * can't evict. The KLL blob is a few KB per source FOREVER — state is
  * bounded by |sources| × sketch size, not by stream length, and the
  * serialized state is the SAME blob format as the batch rollup's
  * (`graft_kll_agg`), so a checkpointed monitor's state can be unioned
  * with batch blobs via `graft_kll_union` (one artifact family across
  * batch and streaming — the q36/nearDupIngest composition argument).
  *
  * State round-trips through `toByteArray`/`heapify` per batch — the
  * identical serialization path the batch aggregate uses at shuffle
  * boundaries, so stream==batch parity in the exact regime is parity of
  * the whole persistence path, not just of the math
  * (StreamingQuantilesSpec pins it).
  *
  * No timeout by default: monitoring state for a finite source set must
  * not silently reset (a timeout-evicted sketch restarts n at 0 and the
  * dashboards see a cliff). For unbounded/churning key spaces pass a
  * `ProcessingTimeTimeout` variant instead — eviction is then an explicit
  * operator choice, not a surprise.
  */
object StreamingQuantiles {

  private val Ranks = Array(0.5, 0.9, 0.99)

  /** `docs` needs `source: string` and `n_chars` (any numeric). Emits
    * update-mode snapshots; pair with a sink that upserts per source. */
  def monitor(docs: DataFrame, k: Int = 2048): Dataset[SourceQuantiles] = {
    QuantileSketch.requireK(k)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("n_chars").cast("double").as("x"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(String, Double)],
         state: GroupState[Array[Byte]]) => {
          val sk =
            if (state.exists) QuantileSketch.heapify(state.get)
            else KllDoublesSketch.newHeapInstance(k)
          rows.foreach(r => sk.update(r._2))
          state.update(sk.toByteArray)
          val q = sk.getQuantiles(Ranks, QuantileSearchCriteria.INCLUSIVE)
          SourceQuantiles(source, sk.getN, q(0), q(1), q(2))
        })
  }
}
