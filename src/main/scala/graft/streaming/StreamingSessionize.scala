package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A finalized user session (the streaming twin of the batch q26 contract:
  * events belong to one session while consecutive gaps are ≤ the gap). */
final case class UserSession(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long)

/** Open per-user session state carried between micro-batches. */
final case class OpenSessions(sessions: List[(Long, Long, Long)]) // (start_us, end_us, n)

/** Gap-based streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state streaming operator family (KeyValueGroupedDataset), distinct
  * from both the batch window form (q26) and the built-in `session_window`
  * (cross-validated in SessionWindowSpec): arbitrary per-key state, event-time
  * timeouts, append-mode emission of only FINALIZED sessions.
  *
  * State per user is a handful of (start, end, count) triples — sessions
  * still open at the watermark — merged order-insensitively within each
  * batch, so out-of-order arrivals inside the watermark are handled. A
  * session finalizes (emits + leaves state) once the watermark passes its
  * end + gap; the event-time timeout guarantees emission even when the user
  * goes silent. Bounded state, exactly what a 100 TB/day clickstream needs.
  */
object StreamingSessionize {

  val DefaultGapUs: Long = 30L * 60 * 1000000 // 30 min, q26 parity

  /** Pure state-merge: fold new event times into the open-session list,
    * coalescing everything whose gap is ≤ `gapUs`. Order-insensitive in
    * `points` (they are sorted first) and in how events were split across
    * prior batches — the property SessionMergeSpec pins. */
  def mergeSessions(prior: List[(Long, Long, Long)], points: Seq[Long],
      gapUs: Long): List[(Long, Long, Long)] = {
    val all = (prior ++ points.sorted.map(u => (u, u, 1L)))
      .sortBy(s => (s._1, s._2))
    all.foldLeft(List.empty[(Long, Long, Long)]) {
      case (acc, s) => acc match {
        case (hs, he, hn) :: tail if s._1 - he <= gapUs =>
          (hs, math.max(he, s._2), hn + s._3) :: tail
        case _ => s :: acc
      }
    }.reverse
  }

  /** `events` needs `user_id: bigint` and an event-time `ts: timestamp`
    * column (already watermark-eligible). Emits finalized sessions. */
  def sessions(events: DataFrame, gapUs: Long = DefaultGapUs,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSessions]) => {
          val prior = if (state.exists) state.get.sessions else Nil
          val merged = mergeSessions(prior, rows.map(_._2).toSeq, gapUs)
          val wmMs = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition { case (_, end, _) =>
            // finalized once the watermark proves no event can extend it
            wmMs > 0 && (end + gapUs) / 1000 < wmMs
          }
          if (open.nonEmpty) {
            state.update(OpenSessions(open))
            state.setTimeoutTimestamp((open.map(_._2).min + gapUs) / 1000 + 1)
          } else {
            state.remove()
          }
          closed.iterator.map { case (s, e, n) => UserSession(user, s, e, n) }
        })
  }
}
