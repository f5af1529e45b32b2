package graft.similarity

import graft.SparkSpec

/** q168 (index-served hard-negative mining) vs q162 (exact brute-force).
  * The label-filter + top-3 re-rank stages are the same logic, so the
  * only legitimate divergence is IVF probe recall at the candidate
  * level. Pinned invariants:
  *  - identical anchor sets with identical anchor labels;
  *  - every mined negative is cross-label with ranks 1..k (k <= 3);
  *  - mean top-3 negative-set overlap vs the exact stage >= 0.6 (the
  *    probe sees topK=10 of a cross-label-filtered corpus, a harder
  *    target than q114's; measured well above the floor at nProbe=10);
  *  - any anchor whose mined set EQUALS the exact set must carry
  *    identical (rank, cos_sim) rows — shared-stage determinism;
  *  - determinism across runs. */
class HardNegativesIndexedSpec extends SparkSpec {

  private def mined(q: String, sf: String) =
    graft.SparkEntry.queries(q)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("q_label"),
        r.getAs[Long]("rank"), r.getAs[Long]("cand_id"),
        r.getAs[Int]("cand_label"), r.getAs[Double]("cos_sim")))

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val tag = sf.split('/').last

    test(s"$tag: indexed mining overlaps the exact set >= 0.6, shared-stage parity") {
      val exact = mined("q162_hard_negatives", sf)
      val idx = mined("q168_hard_negatives_indexed", sf)
      val exactByQ = exact.groupBy(_._1)
      val idxByQ = idx.groupBy(_._1)
      assert(idxByQ.keySet == exactByQ.keySet, "anchor sets differ")
      idxByQ.foreach { case (q, rs) =>
        assert(rs.map(_._2).distinct.length == 1 &&
          rs.head._2 == exactByQ(q).head._2, s"anchor label mismatch for $q")
        assert(rs.forall(r => r._2 != r._5), s"same-label negative for $q")
        assert(rs.map(_._3).sorted.toSeq == (1L to rs.length), s"rank gap for $q")
      }
      val overlaps = exactByQ.map { case (q, ex) =>
        val exSet = ex.map(_._4).toSet
        q -> idxByQ(q).map(_._4).toSet.intersect(exSet).size.toDouble / exSet.size
      }
      val mean = overlaps.values.sum / overlaps.size
      info(f"mean top-3 negative overlap: $mean%.3f over ${overlaps.size} anchors")
      assert(mean >= 0.6, f"negative overlap $mean%.3f below the 0.6 floor")
      val equal = exactByQ.keys.filter(q =>
        idxByQ(q).map(_._4).toSet == exactByQ(q).map(_._4).toSet)
      assert(equal.nonEmpty, "no anchor with perfect probe recall")
      equal.foreach { q =>
        assert(idxByQ(q).map(r => (r._3, r._4, r._6)).toSet ==
          exactByQ(q).map(r => (r._3, r._4, r._6)).toSet,
          s"identical candidate sets but different ranks/scores for $q")
      }
      assert(mined("q168_hard_negatives_indexed", sf).toSeq == idx.toSeq,
        "q168 not deterministic across runs")
    }
  }
}
