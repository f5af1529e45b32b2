package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q108's correctness argument, in four parts:
  *  1. EXACT REGIME — while fewer than k values have been absorbed, a
  *     KLL sketch retains every value, so INCLUSIVE-rule quantiles equal
  *     the order statistics exactly: quantile(r) = sorted value at
  *     1-based index ceil(r·n).
  *  2. MERGE == DIRECT — in the exact regime, union-of-partial-sketches
  *     and one direct accumulation give identical quantiles (both are
  *     the same retained-value multiset).
  *  3. ESTIMATION REGIME — past capacity, estimates stay inside the
  *     published normalized rank error (asserted with 3× headroom
  *     against the library's own getNormalizedRankError bound).
  *  4. BOOKKEEPING — graft_kll_n is exact through accumulate AND union
  *     (carried in the preamble, never estimated); nulls are skipped.
  *
  * q108 itself is rows-only at the driver gate (KLL compaction picks a
  * randomized offset, so estimation-mode blobs are engine-specific) —
  * this spec is the correctness pin, mirroring HllSketchSpec /
  * HeavyHittersSpec for the other two legs of the sketch triad. */
class KllSketchSpec extends SparkSpec {

  private def registered() = { GraftFunctions.register(spark); spark }

  /** Inclusive-rule exact quantile: smallest sorted value whose 1-based
    * position p satisfies p/n >= r. */
  private def exactQuantile(sorted: Array[Double], r: Double): Double =
    sorted(math.max(0, math.ceil(r * sorted.length).toInt - 1))

  test("exact regime: quantiles equal order statistics below capacity") {
    val s = registered()
    import s.implicits._
    // 1000 values < k=2048 -> no compaction can have happened
    val vals = (1 to 1000).map(i => ((i * 7919) % 1000).toDouble)
    val got = vals.toDF("x")
      .agg(expr("graft_kll_quantiles(graft_kll_agg(x, 2048), " +
        "array(0.1D, 0.5D, 0.9D, 0.99D, 1.0D))").as("q"))
      .head().getSeq[Double](0)
    val sorted = vals.sorted.toArray
    val want = Seq(0.1, 0.5, 0.9, 0.99, 1.0).map(exactQuantile(sorted, _))
    assert(got == want, s"exact-regime quantiles diverged: $got vs $want")
  }

  test("merge of partial sketches equals direct build (exact regime)") {
    val s = registered()
    import s.implicits._
    val rows = (1 to 900).map(i => (s"part${i % 9}", ((i * 104729) % 5000).toDouble))
    val df = rows.toDF("part", "x")
    val merged = df.groupBy("part")
      .agg(expr("graft_kll_agg(x, 2048)").as("sk"))
      .agg(expr("graft_kll_quantiles(graft_kll_union(sk, 2048), " +
        "array(0.25D, 0.5D, 0.75D))").as("q"),
        expr("graft_kll_n(graft_kll_union(sk, 2048))").as("n"))
      .head()
    val direct = df
      .agg(expr("graft_kll_quantiles(graft_kll_agg(x, 2048), " +
        "array(0.25D, 0.5D, 0.75D))").as("q"))
      .head().getSeq[Double](0)
    assert(merged.getSeq[Double](0) == direct,
      s"merged quantiles diverged from direct: ${merged.getSeq[Double](0)} vs $direct")
    assert(merged.getLong(1) == 900L, s"union n wrong: ${merged.getLong(1)}")
    val sorted = rows.map(_._2).sorted.toArray
    val want = Seq(0.25, 0.5, 0.75).map(exactQuantile(sorted, _))
    assert(direct == want, s"direct quantiles not exact: $direct vs $want")
  }

  test("estimation regime: rank error within 3x the published bound") {
    val s = registered()
    import s.implicits._
    val n = 100000
    // k=256 forces heavy compaction; values are a permutation of 0..n-1
    // so true normalized rank of value v is (v+1)/n
    val vals = (0 until n).map(i => ((i.toLong * 48271) % n).toDouble)
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(256, false)
    val got = vals.toDF("x").repartition(8)
      .agg(expr("graft_kll_quantiles(graft_kll_agg(x, 256), " +
        "array(0.1D, 0.5D, 0.9D))").as("q"))
      .head().getSeq[Double](0)
    Seq(0.1, 0.5, 0.9).zip(got).foreach { case (r, est) =>
      val trueRank = (est + 1.0) / n
      assert(math.abs(trueRank - r) <= 3 * eps,
        s"rank error at q=$r: estimate $est has true rank $trueRank, bound $eps")
    }
  }

  test("nulls are skipped; empty group yields empty blob, null quantiles") {
    val s = registered()
    import s.implicits._
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "x")
    val out = df.groupBy("g")
      .agg(expr("graft_kll_agg(x, 64)").as("sk"))
      .select(col("g"), expr("graft_kll_n(sk)").as("n"),
        expr("graft_kll_quantiles(sk, array(0.5D))").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2))))
      .toMap
    assert(out("a")._1 == 2L, s"nulls counted in group a: ${out("a")}")
    assert(out("b") == ((0L, None)), s"empty group not (0, null): ${out("b")}")
  }

  test("q108 runs at sf0.001 with sane per-source stats") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q108_quantile_rollup")(spark, sf).collect()
    assert(rows.nonEmpty, "q108 returned no rows")
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 <= p90 && p90 <= p99, s"quantiles not monotone: $r")
      assert(r.getLong(2) > 0, s"n_docs not positive: $r")
    }
    // exact-regime cross-check: per-source doc counts at sf0.001 are far
    // below k=2048, so p50 must equal the exact inclusive median
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (src, rs) =>
        src -> rs.map(_.getLong(1).toDouble).sorted
      }
    rows.foreach { r =>
      val sorted = docs(r.getString(0)).toArray
      assert(r.getDouble(3) == exactQuantile(sorted, 0.5),
        s"p50 for ${r.getString(0)} not exact below capacity")
    }
  }
}
