package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q71's Lloyd trainer contract. The driver oracle pins cross-engine value
  * equality; this spec pins the ALGORITHM properties the oracle can't see:
  * inertia is non-increasing across Lloyd steps (the textbook convergence
  * guarantee — an assignment or recompute bug breaks it immediately), the
  * result is partitioning-invariant (no accidental dependence on row
  * order), and cluster ids always come from the centroid set. */
class KMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def allVecs: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.analytics.Ops.t(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
  }

  private def initCents(all: DataFrame): Seq[(Long, Seq[Double])] =
    all.filter(col("vec_id") < 8).select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq.sortBy(_._1)

  private def inertia(all: DataFrame, cents: Seq[(Long, Seq[Double])]): Double =
    SimilarityQueries.assignToCentroids(all, cents)
      .agg(sum(col("d2"))).collect().head.getDouble(0)

  test("inertia is non-increasing across Lloyd steps") {
    val all = allVecs
    val c0 = initCents(all)
    val c1 = SimilarityQueries.lloydStep(all, c0)
    val c2 = SimilarityQueries.lloydStep(all, c1)
    val (i0, i1, i2) = (inertia(all, c0), inertia(all, c1), inertia(all, c2))
    // 1e-9 relative slack: recomputed centroids surface at 6 dp (the
    // cross-engine contract), which can cost a hair of exact optimality
    assert(i1 <= i0 * (1 + 1e-9), s"step 1 raised inertia: $i0 -> $i1")
    assert(i2 <= i1 * (1 + 1e-9), s"step 2 raised inertia: $i1 -> $i2")
    // and the first step must actually move: equality would mean the
    // recompute silently returned the init centroids
    assert(i1 < i0, s"step 1 did not reduce inertia at all ($i0)")
  }

  test("assignment is invariant under repartitioning (no row-order dependence)") {
    val all = allVecs
    val c1 = SimilarityQueries.lloydStep(all, initCents(all))
    def asg(df: DataFrame): Set[(Long, Long)] =
      SimilarityQueries.assignToCentroids(df, c1)
        .select("vec_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asg(all) == asg(all.repartition(7)))
  }

  test("trained centroids keep ids from the init set and stay 64-dim") {
    val all = allVecs
    val c1 = SimilarityQueries.lloydStep(all, initCents(all))
    assert(c1.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    assert(c1.forall(_._2.length == 64))
    // every cluster in the driver-gated q71 output exists in the trained set
    val out = graft.SparkEntry.queries("q71_kmeans_train")(spark, sf)
    val used = out.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(c1.map(_._1).toSet))
    assert(out.count() == all.count())
  }
}
