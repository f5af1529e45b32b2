package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup candidate PAIRS (q36/q38
  * output) into CLUSTERS via connected components — the step that decides
  * which documents actually get dropped in a dedup pipeline.
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with itself; every iteration each node takes the min label among itself
  * and its neighbors; converged when nothing changes. Iterations = graph
  * diameter, which for near-dup clusters is small (they are dense blobs,
  * not paths). All data-parallel: one shuffle join + one hash-agg per
  * iteration, driver only orchestrates and checks an O(1) convergence bit.
  *
  * Scale notes: `localCheckpoint` truncates the growing lineage each
  * iteration (on a cluster, prefer `checkpoint` to HDFS for fault
  * tolerance); for adversarial high-diameter graphs swap in star
  * contraction / alternating large-small — the API stays the same.
  */
object DedupClusters {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_id = min doc_id reachable).
    * Only documents that appear in some pair are emitted (singletons need
    * no resolution).
    *
    * `maxIter` is a safety bound, not a tuning knob: iterations needed =
    * component diameter, and the default 64 covers even a 64-edit
    * incremental-revision chain (real near-dup clusters are diameter 1–3).
    * Hitting the bound FAILS LOUDLY (require) rather than silently emitting
    * half-merged clusters — wrong dedup output deletes the wrong documents. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 64): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true) // reused every iteration — cut it loose once
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      converged = next.alias("n")
        .join(labels.alias("o"), "node")
        .filter(col("n.label") < col("o.label"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }
}
