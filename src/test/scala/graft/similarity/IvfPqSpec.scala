package graft.similarity

import graft.SparkSpec

/** q244 (IVF-PQ over both persisted indexes) against a brute-force exact
  * anchor: structure (10 queries × 5 ranked rows), exact re-ranked
  * distances on overlaps, and a recall floor. Measured recall@5 vs exact
  * L2 is 0.86/0.74/0.70 at sf0.001/0.01/0.1 — NOTE it beats flat PQ
  * (q239's 0.66 at sf0.1): bounding candidates to plausible IVF cells
  * concentrates the fixed top-50 shortlist budget where the true
  * neighbors live, so the composition recovers recall the flat scan
  * spends on noise. Floor pins 0.70 at sf0.001 with margin. */
class IvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q244 structural contract + exact d2 on overlaps + recall floor") {
    val rows = graft.SparkEntry.queries("q244_ivfpq")(spark, sf).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
    }
    // exact anchor
    val vecs = graft.analytics.Ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val recalls = (0L until 10L).map { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      val exact = vecs.filter(_._1 != qid).map { case (cid, cv) =>
        var d2 = 0.0; var i = 0
        while (i < qv.length) { val t = qv(i) - cv(i); d2 += t * t; i += 1 }
        (cid, math.round(d2 * 1e6) / 1e6)
      }.sortBy { case (cid, d2) => (d2, cid) }.take(5)
      val exactMap = exact.toMap
      val got = byQ(qid).map(r => (r.getAs[Long]("cand_id"),
        r.getAs[Double]("l2_d2")))
      got.foreach { case (cid, d2) =>
        exactMap.get(cid).foreach(e => assert(math.abs(e - d2) <= 1e-6,
          s"query $qid cand $cid: surfaced d2 $d2 != exact $e")) }
      got.map(_._1).toSet.count(exactMap.keySet).toDouble / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.70, s"mean recall@5 $mean below the 0.70 floor")
  }
}
