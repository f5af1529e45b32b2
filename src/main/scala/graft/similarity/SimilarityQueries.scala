package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Ops, QueryDef}
import Ops._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Arithmetic contract: vectors are widened to DOUBLE first, dot/norm are
  * sequential left-folds (`aggregate`), division/sqrt in DOUBLE — the exact
  * same operation order the DuckDB oracle uses, so results are
  * bit-comparable; outputs additionally round to 1e-6 for safety.
  *
  * Scale design: brute-force is the correctness baseline (O(n·q), fine when
  * the query side is small and broadcast); the LSH-bucketed variant
  * (random-hyperplane signs → bucket join) is the 100 TB path — candidates
  * shuffle by bucket id, never the full cross product.
  */
object SimilarityQueries {

  /** Elementwise-double view of an embedding column. */
  private def asDouble(c: String): Column =
    expr(s"transform($c, x -> cast(x AS double))")

  /** L2 norm via the native codegen'd dot product (same sequential
    * summation as the oracle's sqrt(list_dot_product(e,e))). */
  private def l2norm(c: String): Column = expr(s"sqrt(graft_dot($c, $c))")

  /** cosine(a, b) given precomputed norms — norms are evaluated once per
    * vector (narrow pre-pass), not once per pair, and the pair-level dot is
    * the native [[graft.functions.DotProduct]] codegen loop. Arithmetic
    * (dot/(na·nb), sequential sums) stays bit-identical to the oracle.
    *
    * ZERO-NORM guard: cosine is undefined for a zero vector, and Spark 4
    * ANSI throws on DOUBLE division by zero (unlike IEEE) — a single
    * all-zero embedding (models emit them for empty inputs) would
    * otherwise kill the whole job. NULL similarity → the pair/candidate is
    * excluded by every downstream threshold filter and sorts last under
    * desc ordering. Driver testdata has no zero vectors, so oracle parity
    * is unchanged (the guard branch never fires there). */
  private def cosine(a: String, b: String, na: String, nb: String): Column =
    expr(s"CASE WHEN $na * $nb > 0 THEN round(graft_dot($a, $b) / ($na * $nb), 6) " +
      "ELSE CAST(NULL AS DOUBLE) END")

  /** (vec_id, v: array<double>, norm: double) — the shared similarity input. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .select(col("vec_id"), asDouble("embedding").as("v"))
      .withColumn("norm", l2norm("v"))
  }

  /** Session conf key bounding the all-pairs CORRECTNESS BASELINES (q39 /
    * q40). Set to -1 to disable. */
  val MaxBruteForceRowsKey = "spark.graft.similarity.maxBruteForceRows"
  private val DefaultMaxBruteForceRows = 50000L

  /** q39/q40 are quadratic by design (correctness baselines); silently
    * pointing them at a billion-vector table would run for a week. Fail
    * loudly instead: a parquet metadata count (no column scan) against the
    * configurable bound. q41 (LSH) / q42b (IVF) are the scale paths. */
  private def guardBruteForce(s: SparkSession, d: String, query: String): Unit = {
    val limit = s.conf.get(MaxBruteForceRowsKey,
      DefaultMaxBruteForceRows.toString).toLong
    if (limit >= 0) {
      val n = t(s, d, "embeddings").count()
      require(n <= limit,
        s"$query is an all-pairs correctness BASELINE: input has $n vectors " +
          s"(> $MaxBruteForceRowsKey=$limit). Use q41_ann_lsh / q42b_ann_ivf " +
          "at scale, or raise the conf to opt out.")
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ── Near-duplicate pairs by embedding cosine ───────────────────────
    QueryDef("q39_cosine_dup_pairs", (s, d) => {
      guardBruteForce(s, d, "q39_cosine_dup_pairs")
      val a = vecs(s, d).toDF("id_a", "va", "na")
      val b = vecs(s, d).toDF("id_b", "vb", "nb")
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos_sim", cosine("va", "vb", "na", "nb"))
        .filter(col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
    }, Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
          AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.35"""),
      notes = "embedding-cosine near-dup; double-widened, rounded to 1e-6"),

    // ── Brute-force cosine top-k (ANN correctness baseline) ────────────
    QueryDef("q40_ann_topk", (s, d) => {
      guardBruteForce(s, d, "q40_ann_topk")
      val q = vecs(s, d).filter(col("vec_id") < 10).toDF("query_id", "qv", "qn")
      val c = vecs(s, d).toDF("cand_id", "cv", "cn")
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("cand_id").asc)
      broadcast(q).join(c, col("query_id") =!= col("cand_id"))
        .withColumn("cos_sim", cosine("qv", "cv", "qn", "cn"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "cand_id", "rank", "cos_sim")
    }, Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
          round(list_dot_product(q.e, c.e) /
                (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
            AS cos_sim
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      SELECT query_id, cand_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, cand_id ASC) AS BIGINT) AS rank,
        cos_sim
      FROM scored
      QUALIFY rank <= 5"""),
      notes = "brute-force cosine top-5; query side broadcast, tie-broken rank"),

    // ── LSH-bucketed ANN (random-hyperplane signs; the scale path) ─────
    QueryDef("q41_ann_lsh", (s, d) => {
      // Deterministic pseudo-random hyperplanes (components derived from
      // xxhash64 — no RNG state, reproducible on any cluster). 6 planes →
      // 64 buckets: sized so buckets hold ~n/64 candidates; at real scale
      // raise the plane count (buckets grow 2^p) to keep buckets bounded.
      val nPlanes = 6
      val planes =
        s"""transform(sequence(0, ${nPlanes - 1}), p ->
           |  transform(sequence(0, 63), i ->
           |    cast(pmod(xxhash64(p, i), 2001) AS double) / 1000.0 - 1.0))""".stripMargin
      val bucketed = vecs(s, d).withColumn("bucket",
        expr(
          s"""aggregate(
             |  zip_with($planes, sequence(0, ${nPlanes - 1}), (plane, p) ->
             |    if(graft_dot(v, plane) >= 0.0, shiftleft(1L, p), 0L)),
             |  0L, (acc, x) -> acc | x)""".stripMargin))
      val q = bucketed.filter(col("vec_id") < 10).toDF("query_id", "qv", "qn", "bucket")
      val c = bucketed.toDF("cand_id", "cv", "cn", "bucket")
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("cand_id").asc)
      q.join(c, Seq("bucket")).filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos_sim", cosine("qv", "cv", "qn", "cn"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "cand_id", "rank", "cos_sim")
    }, None,
      notes = "LSH-bucketed ANN — shuffles by bucket, not cross product; rows-only (approximate by design)"),

    // ── IVF-style ANN: coarse quantize to centroid cells, probe nearest cells ──
    QueryDef("q42b_ann_ivf", (s, d) => {
      // Deterministic "trained" coarse quantizer: every 25th vector serves
      // as a centroid (a real build would k-means; the assignment/probe
      // dataflow — the part that matters at scale — is identical).
      // Assign: each vector → argmax-dot centroid (broadcast centroids,
      // window argmax). Search: probe each query's 2 nearest cells only.
      val all = vecs(s, d)
      val cents = all.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("dot").desc, col("cent_id").asc)
      val assigned = all.join(broadcast(cents))
        .withColumn("dot", expr("graft_dot(v, cv)"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("norm"), col("cent_id").as("cell"))
      // queries probe their 2 best cells
      val wProbe = Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("cent_id").asc)
      val probes = all.filter(col("vec_id") < 10)
        .toDF("query_id", "qv", "qn")
        .join(broadcast(cents))
        .withColumn("dot", expr("graft_dot(qv, cv)"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("cand_id").asc)
      probes.join(
          assigned.toDF("cand_id", "cv", "cn", "cell"), Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos_sim", cosine("qv", "cv", "qn", "cn"))
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "cand_id", "rank", "cos_sim")
    }, None,
      notes = "IVF coarse-quantized ANN (assign via broadcast-centroid argmax, 2-cell probe); rows-only (approximate)"),

    // ── Vector centroid aggregate (the IVF-training / cluster-mean op) ─
    // posexplode → (label, dim) hash-agg: one shuffle of (label, pos, sum)
    // partials, dims stay distributed (never a per-label collect of
    // vectors). Exactness: each float becomes ROUND(v*1e6) — the product is
    // an EXACT double (float mantissa 24 bits × 1e6's 20 bits < 53), so
    // both engines round the identical value. Exact .5 ties CAN occur
    // (dyadic rationals: v = 1/128 → 7812.5) and agree because Spark
    // round() (HALF_UP) and DuckDB round() both take half AWAY FROM ZERO
    // for either sign — do not swap in bround/HALF_EVEN here.
    QueryDef("q56_vector_centroid", (s, d) => {
      t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(
          sum(round(col("col").cast("double") * 1e6).cast("long")).cast("double")
            / (lit(1e6) * count(lit(1))), 6).as("centroid_v"))
    }, Some("""
      WITH ex AS (
        SELECT label, unnest(list_zip(embedding, range(len(embedding)))) AS z
        FROM embeddings)
      SELECT label, CAST(struct_extract(z, 2) AS BIGINT) AS pos,
        ROUND(CAST(SUM(CAST(ROUND(CAST(struct_extract(z, 1) AS DOUBLE)*1000000) AS BIGINT)) AS DOUBLE)
          / (1000000.0 * COUNT(*)), 6) AS centroid_v
      FROM ex GROUP BY label, pos"""),
      notes = "per-label elementwise centroid; exact integer micro-unit sums both engines")
  )
}
