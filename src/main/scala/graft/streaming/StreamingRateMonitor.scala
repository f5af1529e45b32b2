package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One flagged day from the streaming control chart — same columns and
  * rounding as the q145 batch query, so stream-vs-batch parity is a plain
  * row comparison. */
final case class RateAnomaly(event_type: String, day: Long, n: Long,
    mean7: Double, limit3: Double)

/** Streaming control-chart monitor — the continuous twin of catalog
  * q145_rate_anomaly: per event_type daily volumes checked against the
  * trailing-7-day mean + 3σ band (current day excluded), evaluated
  * continuously as events arrive instead of in a nightly batch.
  *
  * Semantics per micro-batch: state per type is the day→count map; after
  * folding the batch in, EVERY day with a full 7-day trailing window is
  * re-evaluated and the currently-flagged days are emitted (update mode —
  * the sink upserts per (type, day)). A day's flag can therefore fire
  * EARLY — as soon as its partial count crosses the band — which is the
  * monitoring behavior an on-call wants (the batch query only speaks
  * after the day closes), and the final emission over a bounded replay
  * equals the batch answer exactly (StreamingRateMonitorSpec pins both
  * the parity and micro-batch-boundary invariance).
  *
  * The band math mirrors q145 term for term: exact integer Σx/Σx² per
  * window, mean/variance/limit derived in double, 6-dp HALF_UP rounding —
  * so parity is bit-parity, not tolerance.
  *
  * State is bounded: [[Retention]] trailing days per type (eviction =
  * the state-store analog of a watermark). A late event for an evicted
  * day is dropped with the same information loss a watermark imposes on
  * the windowed-agg form; 64 days comfortably covers the 8-day window
  * the band needs plus late-data slack.
  */
object StreamingRateMonitor {

  private[streaming] val Retention = 64

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Evaluate the q145 band over a day→count map: flag days whose count
    * strictly exceeds mean + 3σ of the 7 immediately-preceding observed
    * days (ROWS semantics — present days, not calendar offsets). */
  private[streaming] def flagged(typ: String, m: Map[Long, Long]): Seq[RateAnomaly] = {
    val days = m.keys.toSeq.sorted
    days.flatMap { d =>
      val win = days.takeWhile(_ < d).takeRight(7)
      if (win.size < 7) None
      else {
        val xs = win.map(m)
        val sum = xs.sum
        val sumsq = xs.map(x => x * x).sum
        val mean = sum.toDouble / 7
        val variance = (sumsq.toDouble - sum.toDouble * sum / 7) / 7
        val limit = mean + 3.0 * math.sqrt(variance)
        if (m(d).toDouble > limit)
          Some(RateAnomaly(typ, d, m(d), round6(mean), round6(limit)))
        else None
      }
    }
  }

  /** `events` needs `event_type: string` and `ts` as nanos-since-epoch
    * LONG (the catalog contract). Update-mode emission: the currently
    * flagged (type, day) rows after each micro-batch. */
  def monitor(events: DataFrame): Dataset[RateAnomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], RateAnomaly](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (typ: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) => {
          val m0 = if (state.exists) state.get else Map.empty[Long, Long]
          val folded = rows.foldLeft(m0) { case (m, (_, d)) =>
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          // retention eviction: trailing Retention days only
          val kept =
            if (folded.size <= Retention) folded
            else folded.toSeq.sortBy(_._1).takeRight(Retention).toMap
          state.update(kept)
          flagged(typ, kept).iterator
        })
  }
}
