package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import SkippingIndex.ColRange

/** File-level min/max skipping over the z-ordered lineitem layout.
  * Pins the two halves of the q115 contract separately:
  *  - SOUNDNESS: pruned read == plain filter, across a grid of ranges
  *    including empty, total, and single-point predicates (the driver
  *    hash-gate re-proves one fixed predicate; the grid here proves the
  *    mechanism, not one instance);
  *  - YIELD: on the z-layout a selective 2-D predicate touches a strict
  *    minority of files, and `inputFiles` proves the pruned plan really
  *    lists only survivors (not all files plus a filter);
  *  - the `_graft_manifest` sidecar is invisible to plain readers of the
  *    layout root (underscore convention). */
class SkippingIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val root = graft.IndexCache.ensureZLayout(spark, sf)
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  private def plainFilter(ranges: Seq[ColRange]) =
    spark.read.parquet(root).filter(
      ranges.map(r => col(r.name).between(r.lo, r.hi)).reduce(_ && _))

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))

  test("manifest sidecar is invisible to plain readers of the layout") {
    assert(spark.read.parquet(root).count() == li.count(),
      "layout read must see exactly the data rows, not the manifest")
  }

  test("soundness: pruned read == plain filter across a predicate grid") {
    val grid = Seq(
      Seq(ColRange("l_partkey", 40, 120), ColRange("l_suppkey", 2, 30)),
      Seq(ColRange("l_partkey", 0, 1000000), ColRange("l_suppkey", 0, 1000000)),
      Seq(ColRange("l_partkey", 7, 7)),
      Seq(ColRange("l_suppkey", 9, 9)),
      Seq(ColRange("l_partkey", 150, 199), ColRange("l_suppkey", 0, 3)),
      Seq(ColRange("l_partkey", 500000, 600000)), // fully out of domain
      Seq(ColRange("l_partkey", 0, 50), ColRange("l_suppkey", 8, 9)))
    grid.foreach { ranges =>
      val pruned = SkippingIndex.prunedRead(spark, root, ranges)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .collect().map(key).toSet
      val plain = plainFilter(ranges)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .collect().map(key).toSet
      assert(pruned == plain, s"pruned != plain for $ranges")
    }
    // empty survivor set keeps the full schema
    val empty = SkippingIndex.prunedRead(spark, root,
      Seq(ColRange("l_partkey", 500000, 600000)))
    assert(empty.columns.toSeq == li.columns.toSeq)
    assert(empty.count() == 0)
  }

  test("yield: selective 2-D predicate touches a strict minority of files") {
    val all = spark.read.parquet(root).inputFiles.length
    assert(all >= 8, s"layout should have many files, got $all")
    val ranges = Seq(ColRange("l_partkey", 40, 120), ColRange("l_suppkey", 2, 30))
    val surv = SkippingIndex.survivors(spark, root, ranges)
    info(s"survivors: ${surv.size} of $all files")
    assert(surv.nonEmpty, "predicate matches rows, so some file must survive")
    assert(surv.size < all, "selective predicate must prune at least one file")
    // the pruned plan lists ONLY survivors — skipping happens at planning
    // time, not as a filter over a full listing
    val listed = SkippingIndex.prunedRead(spark, root, ranges).inputFiles.toSet
    assert(listed == surv.toSet,
      "pruned read must list exactly the surviving files")
  }

  test("survivors are a superset of files that actually hold matches") {
    val ranges = Seq(ColRange("l_partkey", 0, 50), ColRange("l_suppkey", 8, 9))
    val surv = SkippingIndex.survivors(spark, root, ranges).toSet
    val withMatches = spark.read.parquet(root)
      .filter(col("l_partkey").between(0, 50) && col("l_suppkey").between(8, 9))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(withMatches.subsetOf(surv),
      "a file holding a matching row was pruned — manifest unsound")
  }
}
