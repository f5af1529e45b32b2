package graft.similarity

import graft.SparkSpec

/** q239 (product quantization + ADC shortlist + exact re-rank) against a
  * brute-force exact-L2 anchor on the sf0.001 corpus: structural contract
  * (10 queries × exactly 5 ranked rows, re-ranked distances nondecreasing)
  * and a recall floor vs exact top-5. The fixture embeddings are
  * near-random — PQ's adversarial regime (true distances concentrate, so
  * quantization noise is comparable to the gaps) — which is exactly why
  * the query re-ranks its ADC shortlist: measured recall@5 is 0.88/0.72/
  * 0.66 at sf0.001/0.01/0.1; the floor pins 0.70 at sf0.001 with margin.
  * Surfaced l2_d2 are EXACT distances (micro-unit integer arithmetic), so
  * they must agree with the anchor's on every overlapping id. */
class PqAdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def exactTop5(): Map[Long, Seq[(Long, Double)]] = {
    val rows = graft.analytics.Ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val qs = rows.filter(_._1 < 10)
    qs.map { case (qid, qv) =>
      val scored = rows.filter(_._1 != qid).map { case (cid, cv) =>
        var d2 = 0.0; var i = 0
        while (i < qv.length) { val t = qv(i) - cv(i); d2 += t * t; i += 1 }
        (cid, math.round(d2 * 1e6) / 1e6)
      }
      (qid, scored.sortBy { case (cid, d2) => (d2, cid) }.take(5).toSeq)
    }.toMap
  }

  test("q239 structural contract: 10 queries x 5 ranked rows, d2 nondecreasing") {
    val rows = graft.SparkEntry.queries("q239_pq_adc")(spark, sf).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
      val d2InRankOrder = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("l2_d2"))
      assert(d2InRankOrder.zip(d2InRankOrder.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q239 recall@5 vs the exact-L2 anchor >= 0.70, exact d2 on overlaps") {
    val anchor = exactTop5()
    val got = graft.SparkEntry.queries("q239_pq_adc")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        (q, rs.map(r => (r.getAs[Long]("cand_id"),
          r.getAs[Double]("l2_d2"))).toSeq) }
    val recalls = anchor.toSeq.map { case (q, exact) =>
      val exactIds = exact.map(_._1).toSet
      val gotMap = got(q).toMap
      // surfaced distances are exact — overlapping ids must agree to 1e-6
      exact.foreach { case (cid, d2) =>
        gotMap.get(cid).foreach(g => assert(math.abs(g - d2) <= 1e-6,
          s"query $q cand $cid: re-ranked d2 $g != exact $d2")) }
      gotMap.keySet.count(exactIds).toDouble / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.70, s"mean recall@5 $mean below the 0.70 floor")
  }
}
