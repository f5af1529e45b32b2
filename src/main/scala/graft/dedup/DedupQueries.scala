package graft.dedup

import org.apache.spark.sql.functions._

import graft.analytics.{Ops, QueryDef}
import Ops._

/** Deduplication operator family over `documents` — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All built from codegen'd built-in
  * expressions (no UDFs): hashing via xxhash64, shingling via higher-order
  * array functions, banding via explode + hash-partitioned groupBy.
  *
  * Scale design (the part that matters at 100 TB):
  *  - signatures are computed in a single narrow scan per doc;
  *  - LSH candidate generation shuffles only (band_id, band_hash, doc_id)
  *    triples — bytes per doc, not the documents themselves;
  *  - exact verification joins only the candidate pairs back to content,
  *    never the full cross product.
  */
object DedupQueries {

  /** 3-token shingles of the space-tokenized text, distinct.
    * A text of n tokens has n-2 shingles. Spark's sequence(0, stop) turns
    * DESCENDING when stop < 0 (sequence(0,-1) = [0,-1], which would crash
    * slice for <=3-token docs), so the index list is built from a safe
    * non-empty sequence and filtered to the valid range — empty for short
    * docs, 0..n-3 otherwise. */
  private[dedup] val shingles =
    "array_distinct(transform(" +
      "filter(sequence(0, greatest(size(split(text, ' ')) - 2, 1) - 1), " +
      "i -> i < size(split(text, ' ')) - 2), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))"

  private val K = 16 // minhash signature length
  private val Bands = 4 // LSH bands (r = K/Bands rows per band)

  /** Hot-bucket guard: max "representative" docs per (band_id, band_hash)
    * bucket. A degenerate cluster (thousands of near-identical docs landing
    * in one bucket) would otherwise self-join quadratically — THE scale
    * killer for LSH dedup at 100 TB. Capping reps bounds a size-n bucket at
    * ~MaxBucketReps*n pairs (reps pair with everything, non-reps only with
    * reps), which keeps every doc connected to its cluster while cutting the
    * non-rep × non-rep quadratic tail. Buckets smaller than the cap are
    * byte-identical to the unguarded plan. */
  private[dedup] val MaxBucketReps = 64

  val defs: Seq[QueryDef] = Seq(

    // ── Exact dedup: hash-groupBy fingerprint clusters ─────────────────
    QueryDef("q35_dedup_exact", (s, d) => {
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("cluster_size"))
    }, Some("""
      SELECT md5(text) AS fp,
             MIN(doc_id) AS keeper_doc_id,
             COUNT(*) AS cluster_size
      FROM documents GROUP BY md5(text)"""),
      notes = "exact dedup via content-hash groupBy; keeper = min doc_id"),

    // ── MinHash signatures + LSH banding (b=4, r=4) ────────────────────
    QueryDef("q36_minhash_lsh", (s, d) => {
      // Signature via explode → codegen'd hash-agg of K seeded min-hashes:
      // each shingle is hashed K times in one pass (no interpreted
      // higher-order lambdas, no expression re-evaluation), one shuffle
      // keyed by doc_id with map-side partial mins. This is the shape that
      // survives 100 TB — state per doc is K longs.
      val sh = t(s, d, "documents")
        .select(col("doc_id"), explode(expr(shingles)).as("sng"))
      val minCols = (0 until K).map(j =>
        min(xxhash64(col("sng"), lit(j))).as(s"h$j"))
      val sig = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      // bands: hash Bands groups of K/Bands consecutive signature slots
      val bandStructs = (0 until Bands).map { b =>
        val slots = (b * K / Bands until (b + 1) * K / Bands).map(j => col(s"h$j"))
        struct(lit(b).as("band_id"), xxhash64(slots: _*).as("band_hash"))
      }
      val banded = sig.select(col("doc_id"),
          explode(array(bandStructs: _*)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
      // candidate pairs = docs sharing any (band_id, band_hash) bucket,
      // with the hot-bucket guard: rank docs within their bucket (same
      // partitioning the join shuffle needs anyway) and let only the first
      // MaxBucketReps act as the left/"rep" side.
      val wBucket = org.apache.spark.sql.expressions.Window
        .partitionBy("band_id", "band_hash").orderBy("doc_id")
      val ranked = banded.withColumn("rn",
        row_number().over(wBucket))
      val reps = ranked.filter(col("rn") <= MaxBucketReps)
      val pairs = reps.as("a").join(ranked.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // per-doc summary (stable one-row-per-doc output): candidate count +
      // sig head. Base is the full documents table — docs whose shingle set
      // is empty (<=2 tokens) have no sig rows but must still appear.
      val candCount = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      t(s, d, "documents").select(col("doc_id"))
        .join(sig, Seq("doc_id"), "left_outer")
        .join(candCount, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          col("h0").as("sig0"), col("h1").as("sig1"))
    }, None,
      notes = "MinHash(k=16)+LSH(b=4,r=4) candidate generation; rows-only (hash fns engine-specific)"),

    // ── SimHash (64-bit, explode + one shuffle keyed by doc) ───────────
    QueryDef("q37_simhash", (s, d) => {
      val tokens = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      val bitCols = (0 until 64).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$i")
      }
      val bitSums = tokens.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      val sim = (0 until 64).map { i =>
        when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
      bitSums.select(col("doc_id"), sim.as("simhash"))
    }, None,
      notes = "64-bit SimHash from token-hash bit votes; rows-only (xxhash64 engine-specific)"),

    // ── n-gram Jaccard within source groups (exact, set-based) ─────────
    QueryDef("q38_ngram_jaccard", (s, d) => {
      graft.functions.GraftFunctions.register(s)
      // Shingles hashed to sorted long arrays ONCE per doc; the O(pairs)
      // inner loop is then a codegen'd two-pointer merge on primitive
      // longs (graft_intersect_card) instead of string-set hashing.
      // Jaccard value is identical to the string-set form modulo xxhash64
      // collisions (~2^-64 — far below the oracle's 1e-6 rounding).
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          expr(s"sort_array(array_distinct(transform($shingles, g -> xxhash64(g))))")
            .as("grams_h"))
        .withColumn("n_grams", size(col("grams_h")))
      val a = docs.as("a"); val b = docs.as("b")
      a.join(b, col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          // drop degenerate pairs where BOTH gram sets are empty (<=2-token
          // docs): jaccard would be 0/0 (ANSI divide-by-zero)
          col("a.n_grams") + col("b.n_grams") > 0)
        // intersection computed ONCE per pair; |A∪B| = |A|+|B|-|A∩B| with
        // per-doc sizes precomputed before the join
        .withColumn("n_inter", expr("graft_intersect_card(a.grams_h, b.grams_h)"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          // the division must be TOTAL even though the join guard excludes
          // both-empty pairs: a downstream filter on jaccard (q57) gets
          // pushed into the join condition, where conjunct evaluation order
          // is undefined and ANSI 0/0 aborts the job before the guard runs
          when(col("a.n_grams") + col("b.n_grams") - col("n_inter") > 0,
            col("n_inter").cast("double") /
              (col("a.n_grams") + col("b.n_grams") - col("n_inter")))
            .otherwise(lit(0.0))
            .as("jaccard"))
    }, Some("""
      WITH g AS (
        SELECT doc_id, source,
          list_distinct(list_transform(
            range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
            i -> string_split(text, ' ')[i] || ' ' ||
                 string_split(text, ' ')[i+1] || ' ' ||
                 string_split(text, ' ')[i+2])) AS grams
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          AS jaccard
      FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
                        AND len(a.grams) + len(b.grams) > 0"""),
      notes = "exact 3-gram Jaccard, blocked by source (LSH is the scale path, q36)"),

    // ── Duplicate-cluster resolution (connected components) ────────────
    // The missing last step of near-dedup: pairs → clusters. Edges are the
    // exact-Jaccard pairs at ≥ 0.6 (deterministic on both engines — q38's
    // jaccard values hash-match, so the threshold filter agrees), clusters
    // via iterative min-label propagation (DedupClusters). The oracle walks
    // the same graph with a recursive CTE — tractable at oracle scale,
    // while the Spark loop is the 100 TB form.
    QueryDef("q57_dup_clusters", (s, d) => {
      val pairs = defs.find(_.name == "q38_ngram_jaccard").get.fn(s, d)
        .filter(col("jaccard") >= 0.6)
        .select("doc_a", "doc_b")
      DedupClusters.connectedComponents(pairs)
    }, Some("""
      WITH RECURSIVE g AS (
        SELECT doc_id, source,
          list_distinct(list_transform(
            range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
            i -> string_split(text, ' ')[i] || ' ' ||
                 string_split(text, ' ')[i+1] || ' ' ||
                 string_split(text, ' ')[i+2])) AS grams
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
                          AND len(a.grams) + len(b.grams) > 0
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          >= 0.6),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src"""),
      notes = "near-dup clusters: min-label-propagation CC over jaccard>=0.6 pairs")
  )
}
