package graft.similarity

import graft.SparkSpec

/** q114 (index-served kNN label vote) vs q113 (exact brute-force vote).
  * The vote stage is SHARED code, so the only legitimate divergence is
  * IVF probe recall at the NEIGHBOR level — and on this corpus labels are
  * uncorrelated with embedding geometry (kNN accuracy ≈ chance), so
  * per-query votes are 1-2 count ties where a single neighbor swap
  * legitimately flips the prediction. The stable invariants are therefore
  * pinned at the right altitude:
  *  - identical query sets with identical true labels;
  *  - mean top-5 neighbor-set recall vs the exact stage >= 0.7 (the
  *    AnnRecallSpec floor; measured 0.80-0.98 at nProbe=10);
  *  - CONDITIONAL verdict parity: any query whose probed neighbor set
  *    equals the exact set must produce the identical verdict row (vote
  *    logic can never diverge on identical inputs);
  *  - determinism across runs. */
class KnnVoteIndexedSpec extends SparkSpec {

  private def neighborSets(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def verdicts(q: String, sf: String) =
    graft.SparkEntry.queries(q)(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2),
        r.getLong(3), r.getLong(4))).toMap

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val tag = sf.split('/').last

    test(s"$tag: neighbor recall >= 0.7; equal-neighbor queries verdict identically") {
      val exactTop = neighborSets(SimilarityQueries.knnExactTop(spark, sf))
      val idxTop = neighborSets(SimilarityQueries.knnIndexedTop(spark, sf))
      assert(idxTop.keySet == exactTop.keySet, "query sets differ")
      val recalls = exactTop.map { case (q, ex) =>
        q -> idxTop(q).intersect(ex).size.toDouble / ex.size }
      val mean = recalls.values.sum / recalls.size
      info(f"mean top-5 neighbor recall: $mean%.3f over ${recalls.size} queries")
      assert(mean >= 0.7, f"neighbor recall $mean%.3f below the 0.7 floor")
      val exactV = verdicts("q113_knn_label_vote", sf)
      val idxV = verdicts("q114_knn_vote_indexed", sf)
      assert(idxV.keySet == exactV.keySet, "verdict query sets differ")
      exactV.foreach { case (q, (t, _, _, _)) =>
        assert(idxV(q)._1 == t, s"true_label mismatch for $q") }
      val equalSets = exactTop.keys.filter(q => idxTop(q) == exactTop(q))
      assert(equalSets.nonEmpty, "no query with perfect probe recall — floor unreachable?")
      equalSets.foreach { q =>
        assert(idxV(q) == exactV(q),
          s"identical neighbor sets but different verdicts for $q") }
      val again = verdicts("q114_knn_vote_indexed", sf)
      assert(again == idxV, "q114 not deterministic across runs")
    }
  }
}
