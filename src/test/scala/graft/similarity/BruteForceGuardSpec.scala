package graft.similarity

import graft.SparkSpec

/** The all-pairs baselines (q39/q40) must FAIL LOUDLY beyond baseline
  * scale instead of silently running quadratic — and stay unchanged
  * under the default guard at testdata scale. */
class BruteForceGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withGuard(limit: String)(body: => Unit): Unit = {
    spark.conf.set(SimilarityQueries.MaxBruteForceRowsKey, limit)
    try body finally spark.conf.unset(SimilarityQueries.MaxBruteForceRowsKey)
  }

  test("q39/q40 trip the guard when the input exceeds the bound") {
    assume(new java.io.File(sf).isDirectory)
    withGuard("1") {
      Seq("q39_cosine_dup_pairs", "q40_ann_topk").foreach { q =>
        val e = intercept[IllegalArgumentException] {
          graft.SparkEntry.queries(q)(spark, sf)
        }
        assert(e.getMessage.contains("BASELINE"), s"$q guard message: ${e.getMessage}")
        assert(e.getMessage.contains("q41_ann_lsh"), "message must name the scale paths")
      }
    }
  }

  test("q38 trips the dedup guard when the corpus exceeds the bound") {
    assume(new java.io.File(sf).isDirectory)
    spark.conf.set(graft.dedup.DedupQueries.MaxBruteForceDocsKey, "1")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("q38_ngram_jaccard")(spark, sf)
      }
      assert(e.getMessage.contains("BASELINE"), s"q38 guard message: ${e.getMessage}")
      assert(e.getMessage.contains("q62_dup_clusters_lsh"),
        "message must name the scale path")
    } finally spark.conf.unset(graft.dedup.DedupQueries.MaxBruteForceDocsKey)
  }

  test("q38 rows unchanged under the default dedup guard") {
    assume(new java.io.File(sf).isDirectory)
    // default guard (50k docs) admits the testdata corpus — build succeeds
    // and rows match an explicitly unguarded run
    val n = graft.SparkEntry.queries("q38_ngram_jaccard")(spark, sf).count()
    spark.conf.set(graft.dedup.DedupQueries.MaxBruteForceDocsKey, "-1")
    try assert(graft.SparkEntry.queries("q38_ngram_jaccard")(spark, sf).count() == n)
    finally spark.conf.unset(graft.dedup.DedupQueries.MaxBruteForceDocsKey)
  }

  test("guard can be disabled with -1 and passes at default under testdata scale") {
    assume(new java.io.File(sf).isDirectory)
    // default guard (50k) admits the testdata embeddings — rows unchanged
    val n = graft.SparkEntry.queries("q40_ann_topk")(spark, sf).count()
    assert(n > 0)
    withGuard("-1") { // explicit opt-out builds without counting against a bound
      assert(graft.SparkEntry.queries("q40_ann_topk")(spark, sf).count() == n)
    }
  }
}
