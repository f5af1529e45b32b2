package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.io.WarcIO

/** Continuous crawl-archive ingest — the raw-bytes front door as a
  * STREAM: crawlers deliver WARC FILES (ISO 28500, the unit q235 reads
  * in batch), and each arriving file's records parse and drive the
  * SAME ledger-checked [[StreamingWebCurate]] stage chain, so a
  * re-delivered archive, a re-crawled URL in a later file, or a 4th
  * page of a capped domain dedups against the standing ledgers exactly
  * as the page-stream form would.
  *
  * Composition is by SHARED DEFINITION on both seams: the file parse is
  * [[WarcIO.pagesOfWarcRows]] (q235's batch reader verbatim) and the
  * curation step is [[StreamingWebCurate.curateBatch]] (whose replay ==
  * `WebCurate.run` contract is already spec-pinned) — this object adds
  * no logic of its own, which is what makes stream ≡ batch provable by
  * composition rather than re-argument.
  *
  * Scale posture: the file-stream source tracks SEEN FILES in its
  * checkpoint (exactly-once file delivery into foreachBatch); one WARC
  * file = one parse task (the q235 contract); page bytes never persist
  * — only the id/hash-sized WebCurate ledgers accumulate. */
object StreamingWarcIngest {

  /** binaryFile's fixed schema — file STREAM sources require it
    * explicitly. */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Watch `warcDir` for new archive files and curate their pages into
    * `outRoot` (StreamingWebCurate's curated zone + ledgers). Matches
    * plain `.warc` AND `.warc.gz` (r12: the Common Crawl transport) —
    * [[WarcIO.pagesOfWarcRows]] sniffs the gzip magic per file, so both
    * forms flow through one decode path and may mix in one directory. */
  def ingest(spark: SparkSession, warcDir: String, outRoot: String,
      checkpoint: String, maxPerDomain: Long = 3L, minQuality: Double = 1.0,
      minJ: Double = 0.6): StreamingQuery =
    spark.readStream.format("binaryFile")
      // exact alternation, not "*.warc*": a half-written "*.warc.tmp"/
      // ".warc.part" must not reach the strict parser and fail the batch
      .option("pathGlobFilter", "*.{warc,warc.gz}")
      .schema(BinaryFileSchema)
      .load(warcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingWebCurate.curateBatch(
          WarcIO.pagesOfWarcRows(batch), outRoot,
          maxPerDomain, minQuality, minJ)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
