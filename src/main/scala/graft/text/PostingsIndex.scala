package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted lexical (BM25) postings index — the [[graft.similarity.VectorIndex]]
  * pattern applied to text retrieval: pay the corpus scan ONCE at build
  * time, then answer any keyword query from term-pruned index reads.
  *
  * Layout under `root/`:
  *  - `postings/`  (tok, doc_id, tf)  — one row per (term, doc)
  *  - `docstats/`  (doc_id, dl)      — per-doc token length
  *  - `termdf/`    (tok, df)         — per-term document frequency
  *  - `corpus/`    (n_docs, t_toks)  — 1-row corpus totals
  *
  * Probe cost model at 100 TB: the query-term filter pushes into the
  * postings parquet scan (PushedFilters on `tok`), so only the queried
  * terms' postings are read — never the corpus; the doc-keyed join to
  * docstats is proportional to the MATCHED postings. Scoring reproduces
  * [[TextQueries.bm25MicroScores]]'s micro-unit integer arithmetic
  * term-for-term, so the index path ranks BIT-IDENTICALLY to the q86
  * scan path (PostingsIndexSpec pins row-for-row parity).
  */
object PostingsIndex {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(filter(split(col("text"), " "),
      (x: org.apache.spark.sql.Column) => length(x) > lit(0))).as("tok"))

  /** One corpus pass → the four index tables. */
  def build(docs: DataFrame, root: String): Unit = {
    val toks = tokens(docs)
    toks.groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet(s"$root/postings")
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(s"$root/docstats")
    toks.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
      .write.mode("overwrite").parquet(s"$root/termdf")
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("t_toks")))
      .write.mode("overwrite").parquet(s"$root/corpus")
  }

  /** BM25 top-k for `terms` from the index alone (no corpus scan).
    * Output (doc_id, bm25, n_terms) matches q86's shape and ordering. */
  def probe(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    val postings = spark.read.parquet(s"$root/postings")
      .filter(col("tok").isin(terms: _*)) // pushed to the parquet scan
    val dl = spark.read.parquet(s"$root/docstats")
    val dfT = spark.read.parquet(s"$root/termdf")
      .filter(col("tok").isin(terms: _*))
    val corpus = spark.read.parquet(s"$root/corpus")
    postings.join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .join(broadcast(dfT), "tok")
      // EXACT replica of bm25MicroScores' micro-unit expression — parity
      // is by identical arithmetic, spec-enforced
      .withColumn("micro", round(
        log(lit(1.0) +
          (lit(2) * (col("n_docs") - col("df")) + lit(1)).cast("double") /
            (lit(2) * col("df") + lit(1)))
          * col("tf").cast("double") * lit(2.2)
          / (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
              lit(0.75) * col("dl").cast("double") /
                (col("t_toks").cast("double") / col("n_docs").cast("double"))))
          * 1000000).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("micro")).as("s"), count(lit(1)).as("n_terms"))
      .orderBy(col("s").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"),
        round(col("s").cast("double") / 1e6, 6).as("bm25"), col("n_terms"))
  }
}
