package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized event with its trailing-window burst (the streaming twin
  * of each batch q193 window row; the batch per-user summary is an
  * aggregation of these). */
final case class VelocityEvent(user_id: Long, ts_us: Long, burst: Long,
    flagged: Long)

/** Per-user state between micro-batches: `hist` = finalized event times
  * still inside the trailing window of some possible future event;
  * `pend` = events not yet finalized (the watermark hasn't passed them —
  * an earlier event could still arrive and change their burst). */
final case class VelocityState(hist: List[Long], pend: List[Long])

/** Continuous transaction-velocity rule — the streaming twin of batch
  * q193, via `flatMapGroupsWithState` (the StreamingSessionize operator
  * family): per user, every event's trailing-24h burst count, flagged at
  * the same threshold, emitted EXACTLY when the event-time watermark
  * proves the count final (no earlier event can still arrive inside the
  * frame). That finalize-at-watermark discipline is what makes stream ==
  * batch row-for-row instead of approximately: an event's burst includes
  * peers and any out-of-order arrivals up to the watermark delay.
  *
  * DOMAIN NOTE (batch/stream divergence, documented loudly): batch q193
  * accepts negative (pre-1970) nanos; this stream twin's domain starts at
  * the EPOCH — Spark's event-time watermark initializes at 0 ms and the
  * late-row filter drops earlier rows AT INGEST, so they never reach the
  * operator. The setTimeoutTimestamp clamp below is belt-and-braces for
  * that engine floor ever changing (a negative target would kill the
  * query); StreamingVelocitySpec pins both behaviors.
  *
  * State per user is bounded by its window-width event count plus the
  * watermark-delay backlog — the same bound the batch RANGE frame
  * carries, which is the point: a fraud rule that holds per-user bounded
  * state scales with users, not events. Aged-out history (older than
  * watermark − window) is pruned every invocation; the event-time
  * timeout guarantees pending events finalize when a user goes silent.
  */
object StreamingVelocity {

  val DefaultWindowUs: Long = 86400L * 1000000 // trailing 24 h, q193 parity
  val DefaultThreshold: Long = 6L              // q193's flag rule

  /** `events` needs `user_id: bigint` and an event-time `ts: timestamp`
    * column. Emits one finalized row per event. */
  def flags(events: DataFrame, windowUs: Long = DefaultWindowUs,
      threshold: Long = DefaultThreshold,
      watermarkDelay: String = "10 minutes"): Dataset[VelocityEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[VelocityState]) => {
          val prior = if (state.exists) state.get else VelocityState(Nil, Nil)
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000
          // sorted ARRAYS + binary search, not per-event List scans: a hot
          // user bursting inside the 24h window (the exact fraud scenario
          // this rule targets) made the old known.count(...)-per-finalized-
          // event form O(|fin|·|hist|) per micro-batch; this invocation is
          // O(n log n) worst case
          val pendAll = (prior.pend.toArray ++ rows.map(_._2)).sorted
          // an event finalizes once the watermark passes it: every event
          // that belongs inside its trailing frame has arrived
          val split = {
            var i = 0
            while (i < pendAll.length && wmMs > 0 && pendAll(i) <= wmUs) i += 1
            i
          }
          val fin = pendAll.take(split)
          val pendLeft = pendAll.drop(split)
          val known = (prior.hist.toArray ++ fin).sorted
          // burst of f = #known in [f - window, f]: two binary searches
          def lowerBound(a: Array[Long], v: Long): Int = {
            var lo = 0; var hi = a.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (a(mid) < v) lo = mid + 1 else hi = mid
            }
            lo
          }
          def upperBound(a: Array[Long], v: Long): Int = {
            var lo = 0; var hi = a.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (a(mid) <= v) lo = mid + 1 else hi = mid
            }
            lo
          }
          val out = fin.map { f =>
            val burst =
              (upperBound(known, f) - lowerBound(known, f - windowUs)).toLong
            VelocityEvent(user, f, burst, if (burst >= threshold) 1L else 0L)
          }
          // prune: any future finalizable event has us > wmUs, so its
          // frame floor is > wmUs - window — older history is dead
          val histLeft = known.filter(_ > wmUs - windowUs)
          if (pendLeft.nonEmpty || histLeft.nonEmpty) {
            state.update(VelocityState(histLeft.toList, pendLeft.toList))
            val nextUs =
              if (pendLeft.nonEmpty) pendLeft.min else histLeft.max + windowUs
            // clamp: pre-1970 event times (batch q193 explicitly supports
            // negative nanos) give a negative target while the watermark is
            // still 0, and a negative setTimeoutTimestamp kills the query
            state.setTimeoutTimestamp(math.max(nextUs / 1000 + 1, wmMs + 1))
          } else state.remove()
          out.iterator
        })
  }
}
