package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-(source, probe-token) running frequency estimate (one row per probe
  * per batch the source appeared in; `n_tokens` is the lifetime token
  * count behind the estimate, so the latest snapshot per (source, token)
  * is the one with the largest n). */
final case class CmsSnapshot(source: String, n_tokens: Long, token: String,
    cms_n: Long)

/** Streaming count-min frequency monitor — the continuous twin of the
  * q210 batch sketch, and the one streaming sketch in the family whose
  * stream==batch parity is EXACT rather than estimator-shaped: CMS
  * counters are plain sums, and sums are associative and commutative, so
  * the counter matrix after any interleaving of micro-batches equals the
  * batch matrix over the union of the rows — StreamingCmsSpec pins
  * counter-level equality against q210's aggregation, not a tolerance.
  *
  * State per source is the D×W long matrix (CmsDepth×CmsWidth = 64
  * counters = 512 bytes) FOREVER, regardless of stream length or
  * vocabulary — the same bounded-state argument as the KLL monitor
  * ([[StreamingQuantiles]]), with exactness instead of rank error. The
  * production read is drift/abuse detection: a probe token (or a newly
  * planted canary string) whose estimated rate jumps between snapshots
  * signals an upstream scraper loop or template flood — the
  * point-frequency member beside the KLL distribution monitor and the
  * theta novelty monitor.
  *
  * Bucket ids are the SAME md5-derived positions as the batch sketch
  * (q210's `TextQueries.cmsDepth`/`cmsWidth` constants),
  * computed here on the JVM side — `MessageDigest` md5 of `tok:d`, first
  * 15 hex chars as a 60-bit long, mod W — so a checkpointed monitor's
  * counter matrix can be UNIONED with batch counter tables by plain
  * addition (one artifact family across batch and streaming, the
  * StreamingQuantiles / nearDupIngest composition argument).
  *
  * No timeout by default for the finite-source monitoring posture: a
  * timeout-evicted counter matrix restarts at zero and the dashboard
  * sees a rate cliff (the [[StreamingQuantiles]] contract).
  */
object StreamingCms {

  /** JVM-side twin of q210's SQL bucket derivation — MUST stay equal to
    * `conv(substring(md5(concat(tok, ':', d)), 1, 15), 16, 10) % W`
    * (StreamingCmsSpec pins the parity). */
  private[streaming] def pos(tok: String, d: Int, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tok:$d".getBytes("UTF-8"))
    val hex = md.take(8).map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** `docs` needs `source: string` and `text: string` (whitespace-token
    * contract shared with q210). Emits update-mode snapshots: one row per
    * (source, probe token) per micro-batch the source appeared in. */
  def monitor(docs: DataFrame, probes: Seq[String],
      depth: Int = graft.text.TextQueries.cmsDepth,
      width: Int = graft.text.TextQueries.cmsWidth): Dataset[CmsSnapshot] = {
    require(probes.nonEmpty, "monitor needs at least one probe token")
    val spark = docs.sparkSession
    import spark.implicits._
    // probe positions are computed ONCE on the driver and closed over —
    // metadata-sized (|probes| × depth ints)
    val probePos: Seq[(String, Array[Int])] =
      probes.map(p => p -> Array.tabulate(depth)(d => pos(p, d, width)))
    docs.select(col("source"), split(col("text"), " ").as("toks"))
      .as[(String, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(String, Seq[String])],
         state: GroupState[Array[Long]]) => {
          // state slot 0 is the lifetime token count; slots 1.. are the
          // row-major D×W counter matrix
          val m = if (state.exists) state.get
                  else new Array[Long](1 + depth * width)
          rows.foreach(_._2.foreach { tok =>
            if (tok.nonEmpty) {
              m(0) += 1
              var d = 0
              while (d < depth) {
                m(1 + d * width + pos(tok, d, width)) += 1
                d += 1
              }
            }
          })
          state.update(m)
          probePos.iterator.map { case (p, ps) =>
            var est = Long.MaxValue
            var d = 0
            while (d < depth) {
              val c = m(1 + d * width + ps(d))
              if (c < est) est = c
              d += 1
            }
            CmsSnapshot(source, m(0), p, est)
          }
        })
  }
}
