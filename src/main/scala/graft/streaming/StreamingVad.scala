package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized speech segment — the streaming twin of a batch
  * [[graft.multimodal.Multimodal.vadSegments]] row (q216). */
final case class VadSegment(media_id: Long, start_window: Long,
    end_window: Long, n_windows: Long, n_active: Long, sq_total: Long)

/** Per-media state between micro-batches: `baseUs` anchors the clip's
  * deterministic window→event-time line (`ts(w) = base + w·step`),
  * `consumedThrough` is the highest window slot already resolved into an
  * emitted-or-dropped segment boundary, `pending` the unconsumed windows.
  * INVARIANT: consumption only happens at a kept=0 slot, and kept=0
  * implies active=0 — so the slot just left behind is always inactive
  * and never needs remembering (the predecessor of the pending head is
  * inactive by construction). */
final case class VadState(baseUs: Long, consumedThrough: Long,
    pending: List[(Long, Long, Long)]) // (window_id, active, sq_sum)

/** Continuous VAD segmentation — the streaming twin of batch q216, via
  * `flatMapGroupsWithState` (the StreamingSessionize/StreamingVelocity
  * operator family), and the streaming family's first MEDIA-SIGNAL
  * member: live audio ingest (a decoder emitting
  * [[graft.multimodal.Multimodal.audioEnergyWindows]]-shaped rows as a
  * clip streams in) segments as it arrives, with each speech segment
  * emitted EXACTLY when the event-time watermark proves it closed.
  *
  * TS CONTRACT: a clip's windows ride a deterministic event-time line
  * `ts(window_id) = clip_base + window_id · stepUs` (the decode cadence
  * — 10 ms windows by default). That determinism is what converts the
  * watermark into a COMPLETENESS proof: once the watermark passes
  * `ts(w)`, window `w` either arrived or never will (Spark drops it at
  * ingest), so absence is decidable, not just suspected. Out-of-order
  * arrival inside the delay is handled (pending merges by window id);
  * a window the watermark outran resolves as silent — the documented
  * robustness fallback, while stream == batch row-for-row holds
  * whenever every window of a clip arrives (the decoder contract;
  * StreamingVadSpec pins parity across micro-batch splits and
  * arrival shuffles).
  *
  * Finalization: `kept(w)` (the q216 hangover rule — active, or
  * inactive bridged by active neighbors) is decided as soon as slots
  * w−1, w, w+1 are each present-or-proven-absent; a segment emits when
  * the first kept=0 slot after it is decided. The event-time timeout is
  * set to the instant the whole pending tail becomes decidable
  * (`ts(maxPending + 2)`), so a clip that simply ends flushes without
  * any poison-pill row. State per media is bounded by the
  * watermark-delay backlog plus one open segment — scales with
  * concurrent clips, not corpus size. */
object StreamingVad {

  val DefaultStepUs: Long = 10000L // 10 ms at the corpus's 8 kHz / 80-sample windows

  /** `wins` needs `media_id, window_id, active, sq_sum` (bigint) and an
    * event-time `ts: timestamp` on the contract line above. Emits one
    * row per finalized segment (min `minActive` active windows, q216
    * parity). */
  def segments(wins: DataFrame, stepUs: Long = DefaultStepUs,
      minActive: Long = 2L,
      watermarkDelay: String = "10 minutes"): Dataset[VadSegment] = {
    val spark = wins.sparkSession
    import spark.implicits._
    wins
      .withWatermark("ts", watermarkDelay)
      .select(col("media_id").cast("long"), col("window_id").cast("long"),
        col("active").cast("long"), col("sq_sum").cast("long"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (media: Long,
         rows: Iterator[(Long, Long, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[VadState]) => {
          val prior = if (state.exists) state.get
            else VadState(Long.MinValue, -1L, Nil)
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val incoming = rows.toList
          val base =
            if (prior.baseUs != Long.MinValue) prior.baseUs
            else incoming.headOption
              .map(r => r._5 - r._2 * stepUs).getOrElse(Long.MinValue)
          // merge + dedupe (at-least-once sources may replay a window)
          val merged = (prior.pending ++
              incoming.map(r => (r._2, r._3, r._4)))
            .sortBy(_._1).distinctBy(_._1)
          val pres = merged.map(t => t._1 -> t).toMap
          val maxW = merged.lastOption.map(_._1)
            .getOrElse(prior.consumedThrough)

          // a slot is KNOWN when it arrived, can no longer arrive (the
          // watermark passed its contract instant), or lies behind the
          // consumption point / before the clip
          def known(w: Long): Boolean =
            w <= prior.consumedThrough || w < 0L || pres.contains(w) ||
              (base != Long.MinValue && wmUs > base + w * stepUs)
          def activeOf(w: Long): Long = pres.get(w).map(_._2).getOrElse(0L)

          var out = List.empty[VadSegment]
          var consumed = prior.consumedThrough
          var runStart = -1L; var runEnd = -1L
          var runWins = 0L; var runActive = 0L; var runSq = 0L
          var w = prior.consumedThrough + 1
          var decidable = true
          while (decidable && w <= maxW + 1) {
            if (known(w - 1) && known(w) && known(w + 1)) {
              val kept = activeOf(w) == 1L ||
                (activeOf(w - 1) == 1L && activeOf(w + 1) == 1L)
              if (kept) {
                if (runStart < 0L) runStart = w
                pres.get(w).foreach { t =>
                  runEnd = w; runWins += 1; runActive += t._2; runSq += t._3
                }
              } else {
                if (runStart >= 0L) {
                  if (runActive >= minActive && runEnd >= 0L)
                    out ::= VadSegment(media, runStart, runEnd, runWins,
                      runActive, runSq)
                  runStart = -1L; runEnd = -1L
                  runWins = 0L; runActive = 0L; runSq = 0L
                }
                consumed = w // kept=0 ⇒ active=0: the invariant above
              }
              w += 1
            } else decidable = false
          }

          val remaining = merged.filter(_._1 > consumed)
          if (remaining.isEmpty && runStart < 0L) state.remove()
          else {
            state.update(VadState(base, consumed, remaining))
            if (base != Long.MinValue) {
              // wake exactly when the pending tail becomes decidable
              val targetMs = (base + (maxW + 2) * stepUs) / 1000 + 1
              state.setTimeoutTimestamp(
                math.max(targetMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.reverseIterator
        })
  }
}
