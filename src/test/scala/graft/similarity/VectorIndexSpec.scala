package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-index contract:
  *  - probing the stored index reproduces the inline q42b result exactly
  *    (same trained quantizer params, same probe dataflow);
  *  - the probe join is exchange-free on the index side — the cells table
  *    is bucketed by cell, so the corpus is read co-located (the
  *    BucketedJoinSpec story applied to ANN serving);
  *  - probes are deterministic across calls (no retraining between). */
class VectorIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("persisted index probe == inline q42b; index side exchange-free") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    try {
      VectorIndex.build(emb, "vidx")
      val queries = emb.filter(col("vec_id") < 10)

      val got = rows(VectorIndex.probe(spark, "vidx", queries))
      val want = rows(graft.SparkEntry.queries("q42b_ann_ivf")(spark, sf))
      assert(got == want, "stored-index probe diverged from the inline q42b result")

      // determinism: a second probe hits the same stored layout
      assert(rows(VectorIndex.probe(spark, "vidx", queries)) == got)

      // plan: force the sort-merge path and assert the cells (right) side
      // reads the bucketed layout with zero shuffle above its scan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val p = VectorIndex.probe(spark, "vidx", queries)
        assert(rows(p) == want, "SMJ path changed the probe result")
        val smj = p.queryExecution.executedPlan.collectFirst {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
        assert(smj.nonEmpty, "expected a sort-merge join on the probe path")
        assert(smj.get.right.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.bucketedScan => s }.nonEmpty,
          s"cells side does not read the bucketed layout:\n${smj.get.right}")
        assert(smj.get.right.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
          s"cells side of the probe join still shuffles:\n${smj.get.right}")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS vidx_centroids")
      spark.sql("DROP TABLE IF EXISTS vidx_cells")
    }
  }
}
