package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact set-similarity PREFIX index — the third persisted
  * structure beside the BM25 postings ([[graft.text.PostingsIndex]]) and
  * the IVF vectors ([[graft.similarity.VectorIndex]]), closing r07's
  * "What's missing #2": q149's delta-vs-base PPJoin re-derived grams and
  * the base-df prefix ordering inline on every run, so the incremental
  * exact-dedup SERVING path re-scanned the base corpus per batch. This
  * operator stores exactly what q149's scaladoc modeled
  * (`DedupQueries.scala` q149: "what a persisted prefix index would
  * store"), making the serving cost delta-proportional.
  *
  * Layout under `root/` (plain parquet, like PostingsIndex):
  *  - `gramdf`    (g, df)                — base gram document frequencies:
  *                                         the index's FROZEN total order
  *  - `prefixes`  (g, doc_id, pos, n)    — per base doc, the first
  *                                         n − ⌈τ·n⌉ + 1 grams under
  *                                         (df asc, g asc) — rarest first
  *  - `docs`      (doc_id, grams_h, n_grams) — full gram sets for the
  *                                         exact verify step
  *
  * ORDER-FREEZE SEMANTICS (the part that makes [[append]] sound): prefix
  * filtering is lossless for ANY total gram order, provided BOTH join
  * sides use the SAME order (Chaudhuri et al.; the PPJoin papers assume
  * df order only for selectivity). The order here is frozen at [[build]]
  * time: [[append]] ranks new docs' prefixes under the ORIGINAL gramdf
  * (unseen grams at df 0, gram-value tiebreak — still total), and
  * [[probe]] ranks the delta the same way — so candidates stay lossless
  * after any number of appends, only prefix SELECTIVITY decays as the
  * frozen df drifts from the true df. A periodic [[build]] is the
  * OPTIMIZE analog that refreshes the order. SetSimIndexSpec pins both:
  * probe == the q149 inline form row-for-row, and append+probe ==
  * rebuild+probe as a match-set (postings differ by design, results may
  * not).
  *
  * Scale shape: [[probe]] touches the delta (narrow gram hashing), one
  * broadcast-or-shuffle join of delta prefixes against the gram-keyed
  * base `prefixes` parquet (pushed-filter scan on g is possible when the
  * delta's gram set is small), and a verify join against `docs` keyed by
  * the candidate doc ids — base never self-joins, never re-scans text.
  */
object SetSimIndex {

  /** Prefix length for a set of size n at threshold `tau`:
    * n − ⌈τ·n⌉ + 1 (0 for empty sets). */
  private def prefixLenExpr(n: String, tau: Double): String =
    s"greatest(cast($n - ceil($tau * $n) + 1 as int), 0)"

  /** Rank each doc's grams by the given (g, df) order and keep the
    * prefix: (doc_id, n, pos, g) with pos 0-based in rarest-first order.
    * `grams` must expose (doc_id, grams_h, n_grams). */
  private def prefixesUnder(grams: DataFrame, gramdf: DataFrame,
      tau: Double): DataFrame = {
    val ex = grams.select(col("doc_id"), explode(col("grams_h")).as("g"))
    ex.join(gramdf, Seq("g"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ord"))
      .select(col("doc_id"), size(col("ord")).as("n"),
        posexplode(expr("transform(slice(ord, 1, " +
          prefixLenExpr("size(ord)", tau) + "), x -> x.g)"))
          .as(Seq("pos", "g")))
  }

  /** Build (or rebuild — refreshing the frozen order) from the base
    * corpus. `base` must expose (doc_id, grams_h, n_grams). */
  def build(base: DataFrame, root: String, tau: Double = 0.5): Unit = {
    val gramdf = base
      .select(col("doc_id"), explode(col("grams_h")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
    gramdf.write.mode("overwrite").parquet(s"$root/gramdf")
    val spark = base.sparkSession
    val storedDf = spark.read.parquet(s"$root/gramdf")
    prefixesUnder(base, storedDf, tau)
      .write.mode("overwrite").parquet(s"$root/prefixes")
    base.select("doc_id", "grams_h", "n_grams")
      .write.mode("overwrite").parquet(s"$root/docs")
  }

  /** Absorb a delta into the index under the FROZEN build-time order:
    * delta prefixes rank by the stored gramdf (unseen grams at df 0) and
    * APPEND to `prefixes`/`docs`; gramdf itself is immutable until the
    * next [[build]] (see order-freeze note above). Cost is
    * delta-proportional: the base postings are never rewritten. */
  def append(spark: SparkSession, root: String, delta: DataFrame,
      tau: Double = 0.5): Unit = {
    val gramdf = spark.read.parquet(s"$root/gramdf")
    prefixesUnder(delta, gramdf, tau)
      .write.mode("append").parquet(s"$root/prefixes")
    delta.select("doc_id", "grams_h", "n_grams")
      .write.mode("append").parquet(s"$root/docs")
  }

  /** All Jaccard ≥ τ pairs between the INDEXED docs and `delta`:
    * (doc_a = indexed, doc_b = delta, jaccard), exactly q149's output
    * shape. The indexed side comes wholly from the stored prefix
    * postings + gram sets; the delta side is ranked under the same
    * frozen order, so the PPJoin length/positional prunes stay lossless. */
  def probe(spark: SparkSession, root: String, delta: DataFrame,
      tau: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val gramdf = spark.read.parquet(s"$root/gramdf")
    val basePre = spark.read.parquet(s"$root/prefixes")
    val baseDocs = spark.read.parquet(s"$root/docs")
    val deltaPre = prefixesUnder(delta, gramdf, tau)
    val minOv = lit(tau / (1 + tau)) *
      (col("a.n") + col("b.n")).cast("double")
    val cand = basePre.as("a")
      .join(deltaPre.as("b"),
        col("a.g") === col("b.g") &&
          col("b.n").cast("double") >= lit(tau) * col("a.n") &&
          col("a.n").cast("double") >= lit(tau) * col("b.n") &&
          (lit(1) + least(col("a.n") - col("a.pos") - 1,
            col("b.n") - col("b.pos") - 1)).cast("double") >= minOv)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(baseDocs.select(col("doc_id").as("doc_a"),
        col("grams_h").as("ga"), col("n_grams").as("na")), Seq("doc_a"))
      .join(delta.select(col("doc_id").as("doc_b"),
        col("grams_h").as("gb"), col("n_grams").as("nb")), Seq("doc_b"))
      .withColumn("n_inter", expr("graft_intersect_card(ga, gb)").cast("long"))
      .withColumn("j0", col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")))
      .filter(col("j0") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("j0"), 6).as("jaccard"))
  }
}
