package graft.pipeline

import graft.SparkSpec

/** The composed curation runner: manifest partitions the input, the run
  * is deterministic, and the pipeline is idempotent — its own output
  * passes every stage untouched (survivors all clear the gate, own
  * unique fingerprints, and are pairwise non-near-dup by the survivor
  * rule). */
class CorpusCurateSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("manifest partitions the input and the run is deterministic") {
    val (curated1, m1) = CorpusCurate.run(docs)
    val (_, m2) = CorpusCurate.run(docs)
    info(s"manifest: $m1")
    assert(m1 == m2, "curation manifest changed between identical runs")
    assert(m1.inputDocs == 500)
    assert(m1.keptDocs > 0 && m1.keptTokens > 0 && m1.shards > 0)
    // every stage fired on the seeded corpus (quality casualties, exact
    // dups, and near dups all exist at sf0.001 by construction)
    assert(m1.qualityDropped > 0, "expected quality casualties in the corpus")
    assert(m1.exactDupDropped + m1.nearDupDropped > 0, "expected dups in the corpus")
    // curated frame agrees with the manifest
    assert(curated1.count() == m1.keptDocs)
    assert(curated1.columns.toSet.contains("shard_id"))
  }

  test("idempotence: curating the curated corpus drops nothing") {
    val (curated, m1) = CorpusCurate.run(docs)
    // materialize between runs — the zone-staging posture the runner's
    // scaladoc prescribes (also required: the LSH guard's observe metric
    // name may appear once per plan, so chained runs must cut lineage)
    val again = curated.select("doc_id", "source", "text").localCheckpoint()
    val (_, m2) = CorpusCurate.run(again)
    assert(m2.inputDocs == m1.keptDocs)
    assert(m2.qualityDropped == 0, s"gate re-dropped docs: $m2")
    assert(m2.exactDupDropped == 0, s"exact dedup re-dropped docs: $m2")
    assert(m2.nearDupDropped == 0, s"near-dup re-dropped docs: $m2")
    assert(m2.keptDocs == m1.keptDocs && m2.keptTokens == m1.keptTokens)
  }

  test("shard budgets: every shard closes within one doc of the token budget") {
    import org.apache.spark.sql.functions._
    val budget = 2048L
    val (curated, _) = CorpusCurate.run(docs, shardTokens = budget)
    // per (source, shard): total tokens can exceed the budget only via its
    // LAST doc (the budget-crossing doc stays in the shard it closes — the
    // q66 rule); so tokens-minus-max-doc must be strictly under budget
    val bad = curated.groupBy("source", "shard_id")
      .agg(sum("n_tokens").as("toks"), max("n_tokens").as("biggest"))
      .filter(col("toks") - col("biggest") >= budget)
      .count()
    assert(bad == 0, s"$bad shards exceed the budget beyond their closing doc")
  }
}
