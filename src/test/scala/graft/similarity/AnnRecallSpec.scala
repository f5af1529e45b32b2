package graft.similarity

import graft.SparkSpec

/** Approximate ANN quality contract: q41 (multi-table sign-LSH) and q42b
  * (Lloyd-trained IVF + multi-cell probe) are rows-only in the driver
  * gate, so THIS spec is what keeps "approximate" honest — recall@5
  * against the exact brute-force baseline (q40) must not silently
  * degrade. Floors sit below the measured values (q41 0.84-0.94 at
  * k=4×L=16, q42b 0.90-0.94 with the k=20 two-step trained quantizer,
  * across sf0.001/sf0.01) by a noise margin; both paths are
  * deterministic (literal planes / deterministic lowest-id k-means
  * init), so a drop means a code change, not sampling variance. */
class AnnRecallSpec extends SparkSpec {

  private def topk(q: String, sf: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(q)(spark, sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet

  private def recall(q: String, sf: String): Double = {
    val exact = topk("q40_ann_topk", sf)
    val approx = topk(q, sf)
    (approx & exact).size.toDouble / exact.size
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val name = sf.split('/').last

    test(s"q41 multi-table LSH recall@5 >= 0.7 at $name") {
      val r = recall("q41_ann_lsh", sf)
      assert(r >= 0.7, s"q41 recall@5 degraded to $r (was 0.84-0.94)")
    }

    test(s"q42b trained-IVF 6-probe recall@5 >= 0.7 at $name") {
      val r = recall("q42b_ann_ivf", sf)
      assert(r >= 0.7, s"q42b recall@5 degraded to $r (was 0.90-0.94)")
    }

    // q105 probes the PERSISTED index; VectorIndexSpec pins probe ==
    // inline q42b exactly, so recall matches q42b's — the floor here is
    // the verdict-ordered >= 0.85 serving bar (measured 0.90-0.94).
    test(s"q105 persisted-index probe recall@5 >= 0.85 at $name") {
      val r = recall("q105_ann_indexed", sf)
      assert(r >= 0.85, s"q105 recall@5 degraded to $r (was 0.90-0.94)")
    }
  }

  test("q41 recall is deterministic across runs (literal planes, no RNG state)") {
    val sf = "/root/testdata/sf0.001"
    assert(topk("q41_ann_lsh", sf) == topk("q41_ann_lsh", sf))
  }
}
