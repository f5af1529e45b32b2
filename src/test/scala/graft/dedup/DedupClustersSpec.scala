package graft.dedup

import graft.SparkSpec

/** Connected-components pins: chains merge transitively, disjoint blobs
  * stay apart, labels are the min doc_id of each component. */
class DedupClustersSpec extends SparkSpec {

  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    DedupClusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two disjoint components resolve to their min ids") {
    val labels = cc((1L, 2L), (2L, 3L), (5L, 6L))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("a long chain converges transitively (diameter > 1 iteration)") {
    val n = 12L
    val chain = (1L until n).map(i => (i, i + 1))
    val labels = cc(chain: _*)
    assert(labels.size == n)
    assert(labels.values.forall(_ == 1L), s"chain not fully merged: $labels")
  }

  test("edge direction does not matter (doc_b < doc_a)") {
    val labels = cc((7L, 4L), (4L, 9L))
    assert(labels == Map(4L -> 4L, 7L -> 4L, 9L -> 4L))
  }
}
