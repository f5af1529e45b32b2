package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.LakeCatalog

/** Persisted IVF index — the "train once, assign many" workflow that the
  * q42b catalog query demonstrates inline. [[build]] pays the training
  * and assignment cost ONCE and persists both halves through the catalog;
  * [[probe]] then serves any number of query batches against the stored
  * layout without retraining or re-assigning.
  *
  * Layout contract:
  *  - `<name>_centroids` (cent_id, cv): k rows of bounded metadata —
  *    always broadcast;
  *  - `<name>_cells` (vec_id, v, norm, cell): every corpus vector with its
  *    cell assignment, BUCKETED (and sorted) BY cell via
  *    `LakeCatalog.saveTable` — a probe joining on `cell` reads co-located
  *    buckets with ZERO exchange on the index side (VectorIndexSpec
  *    plan-asserts it; the BucketedJoinSpec story applied to ANN).
  *
  * At 100 TB: build is two Lloyd scans + one assignment scan + one
  * bucketed write (the one-time shuffle); each probe batch costs a
  * broadcast-centroid argmax over the QUERIES only plus a cell-keyed join
  * that moves probe rows, never the corpus. Small probe batches broadcast
  * into the cells scan; huge ones sort-merge against the bucketed layout
  * — either way the corpus stays put. */
object VectorIndex {

  private def withNorm(emb: DataFrame, v: String, n: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), SimilarityQueries.asDouble("embedding").as(v))
      .withColumn(n, expr(s"sqrt(graft_dot($v, $v))"))
  }

  /** Train a k-means quantizer over `emb` (vec_id, embedding) and persist
    * the index tables. Same defaults as q42b (k=20, two Lloyd steps). */
  def build(emb: DataFrame, name: String, k: Int = 20, iters: Int = 2,
      buckets: Int = 8): Unit = {
    val s = emb.sparkSession
    val all = withNorm(emb, "v", "norm")
    val cdf = SimilarityQueries.centroidFrame(s,
      SimilarityQueries.trainedCentroids(all, k, iters))
    cdf.write.mode("overwrite").saveAsTable(s"${name}_centroids")
    LakeCatalog.saveTable(SimilarityQueries.ivfAssign(all, cdf), s"${name}_cells",
      bucketCols = Seq("cell"), numBuckets = buckets, sortCols = Seq("cell"))
  }

  /** Absorb a delta of NEW vectors without retraining or rescanning: each
    * delta vector is assigned to the STORED (frozen) quantizer — the
    * standard IVF serving contract between scheduled retrains; assignment
    * semantics cannot drift because retrain is an explicit [[build]] — and
    * appended to the bucketed cells table under the same bucket spec, so
    * probes keep their exchange-free co-located read. Delta-proportional
    * cost: one broadcast-centroid argmax over the NEW vectors + one
    * bucketed append. IncrementalIndexSpec pins cells-after-append ==
    * base cells ∪ frozen-quantizer assignment of the delta, and that
    * probes surface delta candidates immediately. */
  def append(s: SparkSession, name: String, emb: DataFrame,
      buckets: Int = 8): Unit = {
    val cents = s.table(s"${name}_centroids")
    val delta = SimilarityQueries.ivfAssign(withNorm(emb, "v", "norm"), cents)
    LakeCatalog.saveTable(delta, s"${name}_cells", mode = "append",
      bucketCols = Seq("cell"), numBuckets = buckets, sortCols = Seq("cell"))
  }

  /** Top-k cosine neighbors for a query batch against the stored index —
    * the q42b probe dataflow reading persisted tables. */
  def probe(s: SparkSession, name: String, queries: DataFrame,
      nProbe: Int = 6, topK: Int = 5): DataFrame =
    probeAgainst(s.table(s"${name}_centroids"), s.table(s"${name}_cells"),
      queries, nProbe, topK)

  /** The cell-selection stage alone: each query's `nProbe` nearest cells
    * by (dot desc, cent_id asc) — (query_id, qv, qn, cell). Factored so
    * compositions (q244's IVF-PQ) can bound candidates by cell without
    * paying the full-vector scoring stage. */
  def probeCells(cents: DataFrame, queries: DataFrame,
      nProbe: Int): DataFrame = {
    val q = withNorm(queries, "qv", "qn").withColumnRenamed("vec_id", "query_id")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("cent_id").asc)
    q.join(broadcast(cents))
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
  }

  /** [[probe]]'s dataflow over caller-supplied centroid/cells frames — the
    * hook for probing a RESTRICTION of a stored index: any filter of the
    * bucketed cells table (e.g. q213's eval slice) is itself a valid IVF
    * index under the same frozen quantizer, and the filter composes with
    * the bucketed scan without disturbing its exchange-free co-location.
    * `cents` must be metadata-sized (it is broadcast); `cells` needs the
    * stored layout's (vec_id, v, norm, cell). */
  def probeAgainst(cents: DataFrame, cellsFrame: DataFrame, queries: DataFrame,
      nProbe: Int = 6, topK: Int = 5): DataFrame = {
    val probes = probeCells(cents, queries, nProbe)
    val cells = cellsFrame.select(col("vec_id").as("cand_id"),
      col("v").as("cv"), col("norm").as("cn"), col("cell"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", SimilarityQueries.cosine("qv", "cv", "qn", "cn"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "cand_id", "rank", "cos_sim")
  }

  /** Range search over a stored index: ALL candidates with cosine ≥ `tau`
    * in the query's `nProbe` nearest cells — [[probeAgainst]] with the
    * rank window replaced by a threshold filter. No top-k truncation
    * means no rank window in the plan at all (the scored candidate
    * stream filters in place, map-side); output volume is bounded by the
    * TRUE number of τ-near pairs in the probed cells, which is the
    * operator's semantic payload — the shape screening passes (q213's
    * reverse direction) need, where a hot query near more than k
    * candidates must surface every one of them. */
  def probeThreshold(cents: DataFrame, cellsFrame: DataFrame,
      queries: DataFrame, tau: Double, nProbe: Int = 6): DataFrame = {
    val q = withNorm(queries, "qv", "qn").withColumnRenamed("vec_id", "query_id")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents))
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
    val cells = cellsFrame.select(col("vec_id").as("cand_id"),
      col("v").as("cv"), col("norm").as("cn"), col("cell"))
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", SimilarityQueries.cosine("qv", "cv", "qn", "cn"))
      .filter(col("cos_sim") >= tau)
      .select("query_id", "cand_id", "cos_sim")
  }
}
