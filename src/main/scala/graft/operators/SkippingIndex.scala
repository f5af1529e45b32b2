package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics manifest + manifest-pruned scan planning —
  * the lakehouse data-skipping layer (Delta "file statistics" / Iceberg
  * manifests) built from Spark primitives, and the consumer that makes
  * [[ZOrderLayout]]'s clustered writes actually pay off.
  *
  * Parquet footers already carry row-group min/max, but Spark only uses
  * them AFTER listing and opening every file — at 100 TB the scan-planning
  * cost is dominated by file opens, not row decoding. A manifest (one row
  * per file, driver-sized: 100 TB / 1 GB files = 10^5 rows) moves that
  * decision before any data file is touched: survivors are chosen by
  * interval overlap against the manifest, and only they are listed in the
  * read. On a z-ordered layout every contiguous file is a bounded box in
  * both clustering dimensions, so a 2-D predicate prunes to O(selectivity)
  * files (SkippingIndexSpec measures it; q115 is the driver-gated query).
  *
  * Soundness contract: pruning is SPECULATIVE — survivors are a superset
  * of matching files (a file whose [min,max] overlaps the range may hold
  * no matching row) — so [[prunedRead]] always re-applies the ranges as a
  * residual filter, which Catalyst additionally pushes into the parquet
  * scan for row-group skipping within survivors. Equality with the
  * unpruned filter is therefore structural, and the driver hash-gate
  * (q115 vs a plain WHERE in DuckDB) re-proves it every round.
  *
  * The manifest lives UNDER the dataset root in `_graft_manifest`: the
  * underscore prefix makes it invisible to Spark/Hadoop dataset listing
  * (same convention as `_SUCCESS`), so plain readers of the root see only
  * data files and need never know the manifest exists.
  */
object SkippingIndex {

  val ManifestDir = "_graft_manifest"

  /** Inclusive [lo, hi] predicate on one manifest-indexed column. */
  final case class ColRange(name: String, lo: Long, hi: Long)

  /** Scan the dataset once and write a one-row-per-file min/max manifest
    * for `statsCols`. O(files) output; the single scan prunes to exactly
    * the indexed columns. Call after every layout rewrite (the layout
    * writer owns the ordering; the manifest just records per-file bounds,
    * so it works on ANY layout — clustering only improves its yield). */
  def buildManifest(spark: SparkSession, root: String,
      statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(root)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // manifest is O(files) rows — one tiny file by design
      .write.mode("overwrite").parquet(s"$root/$ManifestDir")
  }

  /** Scan planning: the data files whose recorded [min,max] intervals
    * overlap EVERY range. Driver-side by design — this is metadata the
    * size of the file listing (the same thing Spark's own FileIndex holds
    * on the driver), never data. Sorted for deterministic read order. */
  def survivors(spark: SparkSession, root: String,
      ranges: Seq[ColRange]): Seq[String] = {
    require(ranges.nonEmpty, "ranges must be non-empty")
    val keep = ranges.map(r =>
      col(s"min_${r.name}") <= r.hi && col(s"max_${r.name}") >= r.lo)
      .reduce(_ && _)
    spark.read.parquet(s"$root/$ManifestDir")
      .filter(keep).select("file")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Read exactly the rows of `root` matching all `ranges`, touching only
    * manifest-surviving files. The residual filter keeps the result equal
    * to `spark.read.parquet(root).filter(ranges)` whatever the manifest
    * says (and reaches the parquet scan as a pushed filter for row-group
    * skipping inside survivors). Empty survivor set short-circuits to an
    * empty result with the full schema. */
  def prunedRead(spark: SparkSession, root: String,
      ranges: Seq[ColRange]): DataFrame = {
    val files = survivors(spark, root, ranges)
    val residual = ranges.map(r => col(r.name).between(r.lo, r.hi))
      .reduce(_ && _)
    if (files.isEmpty) spark.read.parquet(root).filter(lit(false))
    else spark.read.parquet(files: _*).filter(residual)
  }
}
