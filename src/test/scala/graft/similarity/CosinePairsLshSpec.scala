package graft.similarity

import graft.SparkSpec

/** q68 (LSH-fed cosine near-dup pairs) against its exactness twin q39:
  * every emitted pair must be a q39 pair with the IDENTICAL cos_sim (the
  * verify step is exact — only coverage is approximate), and recall must
  * stay above the measured floor (0.96-0.98 at k=3 × L=12 across
  * sf0.001/sf0.01; both paths deterministic, so a drop is a code change). */
class CosinePairsLshSpec extends SparkSpec {

  private def pairs(q: String, sf: String): Set[(Long, Long, Double)] =
    graft.SparkEntry.queries(q)(spark, sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val name = sf.split('/').last

    test(s"q68 pairs ⊆ q39 with identical cos_sim, recall >= 0.9 at $name") {
      val exact = pairs("q39_cosine_dup_pairs", sf)
      val lsh = pairs("q68_cosine_pairs_lsh", sf)
      assert(lsh.subsetOf(exact),
        s"LSH path emitted ${(lsh -- exact).size} pairs q39 does not have " +
          "(the exact-verify step must make every emitted pair exact)")
      val recall = (lsh & exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"q68 recall degraded to $recall (was 0.96-0.98)")
    }
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val name = sf.split('/').last

    test(s"q68b (md5-portable, hash-gated) pairs sound vs q39, recall floored at $name") {
      // q68b rounds integer-first (round(cos*1e6)/1e6) where q39 rounds
      // round(cos, 6): compare on ids and on cos to the shared 6-dp grid
      val exact = pairs("q39_cosine_dup_pairs", sf)
        .map { case (a, b, c) => (a, b, math.round(c * 1e6)) }
      val md5Lsh = pairs("q68b_cosine_pairs_lsh_md5", sf)
        .map { case (a, b, c) => (a, b, math.round(c * 1e6)) }
      assert(md5Lsh.subsetOf(exact),
        s"q68b emitted ${(md5Lsh -- exact).size} pairs q39 does not have")
      val recall = (md5Lsh & exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"q68b recall degraded to $recall")
    }
  }

  test("q68 is deterministic across runs (literal planes)") {
    val sf = "/root/testdata/sf0.001"
    assert(pairs("q68_cosine_pairs_lsh", sf) == pairs("q68_cosine_pairs_lsh", sf))
  }
}
