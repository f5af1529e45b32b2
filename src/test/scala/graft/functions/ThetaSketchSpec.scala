package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q154's correctness argument, in five parts:
  *  1. EXACT REGIME — below nominal entries (k) no hash has been
  *     discarded, so estimates equal exact distinct counts, for the
  *     base aggregate AND for every set operation over exact sketches.
  *  2. DETERMINISM — theta has no randomized compaction: the same input
  *     SET yields byte-identical ordered-compact blobs at any
  *     parallelism (this is why q154 can be ORACLE-gated where the
  *     KLL/HLL/FI queries are rows-only).
  *  3. MERGE == DIRECT — union of per-part blobs equals one direct
  *     accumulation, byte-for-byte, in and out of the exact regime.
  *  4. SET ALGEBRA — |A∩B| + |A\B| = |A| holds exactly on sketch
  *     results in the exact regime (the q154 matrix invariant).
  *  5. ESTIMATION REGIME — past k, estimates stay inside the published
  *     relative error (~1/sqrt(k), asserted with 3× headroom) and the
  *     blobs remain deterministic.
  */
class ThetaSketchSpec extends SparkSpec {

  private def registered() = { GraftFunctions.register(spark); spark }

  test("exact regime: estimates equal exact distinct counts incl. set ops") {
    val s = registered()
    import s.implicits._
    // A = {0..599}, B = {300..899}: 600 distinct each, 300 shared
    val df = ((0 until 600).map(i => ("a", s"v$i")) ++
      (300 until 900).map(i => ("b", s"v$i"))).toDF("side", "v")
    val row = df.groupBy("side").agg(expr("graft_theta_agg(v, 4096)").as("sk"))
      .groupBy().pivot("side", Seq("a", "b")).agg(first("sk"))
      .select(
        expr("CAST(round(graft_theta_estimate(a)) AS BIGINT)").as("na"),
        expr("CAST(round(graft_theta_estimate(b)) AS BIGINT)").as("nb"),
        expr("CAST(round(graft_theta_estimate(graft_theta_intersect2(a, b))) AS BIGINT)")
          .as("shared"),
        expr("CAST(round(graft_theta_estimate(graft_theta_anotb(a, b))) AS BIGINT)")
          .as("onlyA"))
      .head()
    assert(row.getLong(0) == 600 && row.getLong(1) == 600)
    assert(row.getLong(2) == 300, s"exact intersection: ${row.getLong(2)}")
    assert(row.getLong(3) == 300, s"exact a-not-b: ${row.getLong(3)}")
  }

  test("determinism: same set -> byte-identical blob at any parallelism") {
    val s = registered()
    import s.implicits._
    val vals = (0 until 5000).map(i => s"item${(i * 7919) % 3000}") // dups too
    def blob(parts: Int): Array[Byte] = vals.toDF("v").repartition(parts)
      .agg(expr("graft_theta_agg(v, 1024)").as("sk")).head().getAs[Array[Byte]](0)
    val b1 = blob(1); val b7 = blob(7); val b32 = blob(32)
    assert(java.util.Arrays.equals(b1, b7) && java.util.Arrays.equals(b7, b32),
      "blob bytes varied with partitioning")
  }

  test("union rollup == direct accumulation, byte-for-byte") {
    val s = registered()
    import s.implicits._
    val rows = (0 until 9000).map(i => (s"part${i % 9}", s"u${(i * 104729) % 6000}"))
    val df = rows.toDF("part", "v")
    val rolled = df.groupBy("part").agg(expr("graft_theta_agg(v, 1024)").as("sk"))
      .agg(expr("graft_theta_union(sk, 1024)").as("sk")).head().getAs[Array[Byte]](0)
    val direct = df.agg(expr("graft_theta_agg(v, 1024)").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(rolled, direct),
      "union-of-parts != direct build")
  }

  test("aggregate intersection: items present in every group") {
    val s = registered()
    import s.implicits._
    // common items c0..c49 in all 4 groups; each group adds 100 own items
    val rows = (0 until 4).flatMap { g =>
      (0 until 50).map(i => (s"g$g", s"c$i")) ++
        (0 until 100).map(i => (s"g$g", s"own${g}_$i"))
    }
    val got = rows.toDF("g", "v")
      .groupBy("g").agg(expr("graft_theta_agg(v, 4096)").as("sk"))
      .agg(expr(
        "CAST(round(graft_theta_estimate(graft_theta_intersect(sk, 4096))) AS BIGINT)")
        .as("n"))
      .head().getLong(0)
    assert(got == 50, s"aggregate intersection: $got != 50")
  }

  test("estimation regime: inside published error with 3x headroom, still deterministic") {
    val s = registered()
    import s.implicits._
    val n = 60000 // >> k = 4096
    val vals = (0 until n).map(i => s"big$i")
    def est(parts: Int): (Double, Array[Byte]) = {
      val r = vals.toDF("v").repartition(parts)
        .agg(expr("graft_theta_agg(v, 4096)").as("sk"))
        .select(expr("graft_theta_estimate(sk)").as("e"), col("sk")).head()
      (r.getDouble(0), r.getAs[Array[Byte]](1))
    }
    val (e1, b1) = est(3); val (e2, b2) = est(11)
    // published RSE ~ 1/sqrt(k) = 1.56%; allow 3x
    assert(math.abs(e1 - n) / n < 0.047, s"estimate $e1 off by >3x RSE from $n")
    assert(java.util.Arrays.equals(b1, b2), "estimation-mode blob nondeterministic")
    assert(e1 == e2)
  }

  test("empty group -> empty sketch (estimate 0), virgin intersection -> null") {
    val s = registered()
    import s.implicits._
    val empty = Seq.empty[String].toDF("v")
      .agg(expr("graft_theta_estimate(graft_theta_agg(v, 1024))").as("e"))
      .head().getDouble(0)
    assert(empty == 0.0)
    val virgin = Seq.empty[(String, Array[Byte])].toDF("g", "sk")
      .agg(expr("graft_theta_intersect(sk, 1024)").as("sk"))
      .select(expr("graft_theta_estimate(sk)").as("e")).head()
    assert(virgin.isNullAt(0), "virgin intersection should be SQL NULL")
  }
}
