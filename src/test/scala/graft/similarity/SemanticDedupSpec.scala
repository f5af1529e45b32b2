package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q74's survivor-set contract (the driver oracle pins values; this pins
  * the SEMANTICS of the keep-earliest rule):
  *  - survivors within one cell are pairwise BELOW the 0.35 threshold —
  *    the rule "drop iff an earlier in-cell vector matches" closes the
  *    survivor set under the pair relation (if cos(a,b) >= tau and a < b,
  *    b is dropped), so this must hold exactly, not approximately;
  *  - every dropped vector has an EARLIER in-cell neighbor at >= 0.35
  *    (nothing is dropped without a witness);
  *  - survivors + dropped partition the corpus. */
class SemanticDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val tau = 0.35

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("survivors are pairwise dissimilar in-cell; dropped have an earlier witness") {
    graft.functions.GraftFunctions.register(spark)
    // the SAME cell assignment q74 uses (shared ivfAssign dataflow)
    val all = graft.analytics.Ops.t(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
    import spark.implicits._
    val cents = SimilarityQueries.trainedCentroids(all, k = 20, iters = 1)
      .toDF("cent_id", "cv")
    val byCell = SimilarityQueries.ivfAssign(all, cents)
      .select("vec_id", "v", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))

    val survivors = graft.SparkEntry.queries("q74_semantic_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // partition property
    assert(survivors.keySet.subsetOf(byCell.map(_._1).toSet))
    val dropped = byCell.filterNot(v => survivors.contains(v._1))
    assert(survivors.size + dropped.length == byCell.length)
    assert(dropped.nonEmpty, "threshold produced no drops — spec has no teeth")

    val cells = byCell.groupBy(_._3)
    for ((cell, vs) <- cells) {
      val surv = vs.filter(v => survivors.contains(v._1)).sortBy(_._1)
      // q74 reports the same cell ivfAssign computed
      surv.foreach(v => assert(survivors(v._1) == cell))
      // pairwise dissimilarity among survivors of this cell
      for (i <- surv.indices; j <- (i + 1) until surv.length)
        assert(cos(surv(i)._2, surv(j)._2) < tau,
          s"survivors ${surv(i)._1}/${surv(j)._1} in cell $cell at >= $tau")
      // every dropped member has an earlier in-cell >= tau witness
      for (d <- vs.filterNot(v => survivors.contains(v._1)))
        assert(vs.exists(w => w._1 < d._1 && cos(w._2, d._2) >= tau),
          s"dropped ${d._1} in cell $cell has no earlier witness")
    }
  }
}
