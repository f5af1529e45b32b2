package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted product-quantization index — the "encode once, probe many"
  * serving form of the q239 kernel, the PQ sibling of [[VectorIndex]].
  *
  * Layout contract:
  *  - `<name>_codebook` (m, cid, ce): M·K = 128 rows of bounded metadata
  *    — always broadcast. Doubles round-trip parquet bit-exactly, so a
  *    probe against the stored codebook reproduces the inline trainer's
  *    arithmetic EXACTLY (probe == inline is structural: both run
  *    [[SimilarityQueries.pqAdcShortlistRerank]]).
  *  - `<name>_codes` (vec_id, code: array<int>): ONE row per vector, the
  *    8-small-ints compressed form — this is the whole point of PQ at
  *    100 TB: the scan side of every probe reads 8 bytes per candidate
  *    instead of 256 float bytes. Probes explode it back to (vec_id, m,
  *    cid) with a narrow generator — no shuffle; the ADC table arrives
  *    broadcast.
  *
  * The exact re-rank stage reads full vectors ONLY for the ≤ 50·|queries|
  * shortlisted ids — at scale that is a point-lookup against the source
  * store, here a join against the caller-supplied corpus frame. */
object PqIndex {

  private def vecs(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"),
      SimilarityQueries.asDouble("embedding").as("e"))
  }

  /** (vec_id, code) rows: every vector of `sub` encoded against `cb` —
    * shared by [[build]] (fresh codebook) and [[append]] (frozen stored
    * codebook), so the two paths cannot drift. */
  private def encodeCodes(sub: DataFrame, cb: DataFrame): DataFrame =
    SimilarityQueries.pqAssign(sub, cb)
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(m, cid))), x -> cast(x.cid AS int))")
        .as("code"))

  /** Train the per-subspace codebooks over `emb` (vec_id, embedding),
    * encode every vector, persist both tables. Same parameters as q239
    * (M=8, K=16, one exact micro-unit Lloyd step, lowest-16 init). */
  def build(emb: DataFrame, name: String): Unit = {
    val v = vecs(emb).localCheckpoint(true)
    val sub = SimilarityQueries.pqSubspaces(v)
    val cb = SimilarityQueries.pqTrainCodebook(sub)
    cb.write.mode("overwrite").saveAsTable(s"${name}_codebook")
    encodeCodes(sub, cb).write.mode("overwrite").saveAsTable(s"${name}_codes")
  }

  /** Absorb a delta of NEW vectors without retraining (r12, VERDICT
    * punch #8 — the maintenance parity with [[VectorIndex.append]]):
    * each delta vector is ENCODED against the STORED, frozen codebook —
    * the standard PQ serving contract between scheduled retrains
    * (codewords move only at an explicit [[build]], so ADC tables built
    * from the stored codebook stay valid for old AND new codes) — and
    * appended to the codes table. Delta-proportional cost: one
    * broadcast-codebook subspace argmin over the NEW vectors + one
    * 8-bytes-per-vector append. IncrementalIndexSpec pins
    * codes-after-append == base ∪ frozen-codebook encode of the delta,
    * and that probes surface delta candidates immediately. */
  def append(s: SparkSession, name: String, emb: DataFrame): Unit = {
    val v = vecs(emb).localCheckpoint(true)
    val sub = SimilarityQueries.pqSubspaces(v)
    encodeCodes(sub, s.table(s"${name}_codebook"))
      .write.mode("append").saveAsTable(s"${name}_codes")
  }

  /** ADC shortlist + exact re-rank against the stored layout for the
    * vec_id < 10 query batch (the q239 probe contract). `corpus`
    * supplies full vectors for queries and the re-rank point-lookups. */
  def probe(s: SparkSession, name: String, corpus: DataFrame): DataFrame = {
    val v = vecs(corpus).localCheckpoint(true)
    val cb = s.table(s"${name}_codebook")
    val codes = s.table(s"${name}_codes")
      .select(col("vec_id"), posexplode(col("code")))
      .select(col("vec_id"), col("pos").cast("int").as("m"),
        col("col").cast("bigint").as("cid"))
    SimilarityQueries.pqAdcShortlistRerank(codes, cb, v)
  }
}
