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
    // ONE scan of the (possibly expensive) pair pipeline: explode each
    // pair into both directions instead of a union of two projections —
    // the union form computed the whole upstream (e.g. q38's all-pairs
    // verify) twice, once per branch.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist() // reused every iteration; freed after convergence
    // Iteration 1 folded into the seed: with identity labels the min
    // neighbor label of `node` is simply min(src) over its in-edges, so
    // the first join of the generic loop is a no-op — seed labels with
    // least(node, min neighbor) directly (edges are symmetric, so every
    // node appears as dst).
    var labels = edges.groupBy(col("dst").as("node"))
      .agg(min(col("src")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("label"))
      .persist()
    var iter = 1
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      // ONE job per iteration: the changed flag rides the label update,
      // and counting the changed rows both MATERIALIZES the persisted
      // next-labels cache and answers convergence — the previous form
      // paid a checkpoint job plus a separate convergence join per
      // iteration (3 shuffles/2 jobs; now 1/1).
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          (col("nbr_label") < col("label")).as("__changed"))
        .persist()
      converged = next.filter(col("__changed")).count() == 0L
      labels.unpersist(false) // superseded generation; next is materialized
      labels = next.drop("__changed")
      iter += 1
      // Adversarial high-diameter graphs: cut the join lineage every 8
      // generations so plan growth stays bounded (each cut is one extra
      // job, amortized over 8 iterations; diameter-1-3 dedup graphs never
      // reach it).
      if (iter % 8 == 0) labels = labels.localCheckpoint(true)
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    edges.unpersist(false)
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }
}
