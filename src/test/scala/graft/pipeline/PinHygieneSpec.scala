package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cache-pin hygiene (r15, VERDICT r14 #4 / ADVICE r14): the curation
  * entry points and the eager CC-family query fns release their internal
  * `persist()` pins, so a long-lived session calling them repeatedly does
  * not accumulate strongly-held CacheManager entries. localCheckpoint
  * blocks are excluded — the ContextCleaner reclaims those when their
  * frames go out of scope (the r11 adjudication), and dropping them
  * eagerly would lose data their truncated lineage cannot recompute. */
class PinHygieneSpec extends SparkSpec {

  private def sf = "/root/testdata/sf0.001"

  /** Persisted RDD ids that are NOT locally-checkpointed frames. */
  private def pinIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs
      .filterNot(_._2.isCheckpointed).keySet.toSet

  test("CorpusCurate.run(retainPin=false) releases every cache pin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val before = pinIds
    val (_, m) = CorpusCurate.run(docs, retainPin = false)
    assert(m.inputDocs > 0)
    val leaked = pinIds -- before
    assert(leaked.isEmpty, s"CorpusCurate.run leaked cache pins: $leaked")
  }

  test("WebCurate.run(retainPin=false) releases every cache pin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val pages = docs.select(
      col("doc_id").as("page_id"),
      graft.text.UrlOps.syntheticUrl(col("doc_id")).as("url"),
      graft.text.HtmlExtract.syntheticHtml(col("doc_id"), col("text")).as("html"),
      col("source"))
    val before = pinIds
    val (_, m) = WebCurate.run(pages, retainPin = false)
    assert(m.pages > 0)
    val leaked = pinIds -- before
    assert(leaked.isEmpty, s"WebCurate.run leaked cache pins: $leaked")
  }

  test("observe-fused manifests equal the r14 two-pass counts") {
    // the pinned CorpusCurateSpec manifest re-asserted here so the
    // observe() rewrite is pinned against the historical aggregate form
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (_, m) = CorpusCurate.run(docs, retainPin = false)
    assert(m == CorpusCurate.Manifest(500, 67, 0, 21, 0, 0, 412, 25182, 20),
      s"manifest drifted under the observe() rewrite: $m")
  }

  test("eager CC-family query fns release their pins (q57/q62/q107/q107b)") {
    for (q <- Seq("q57_dup_clusters", "q62_dup_clusters_lsh",
        "q107_lsh_canonical", "q107b_lsh_canonical_md5")) {
      val before = pinIds
      graft.SparkEntry.queries(q)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val leaked = pinIds -- before
      assert(leaked.isEmpty, s"$q leaked cache pins: $leaked")
    }
  }
}
