package graft.dedup

import java.nio.file.Files

import graft.SparkSpec

/** Regression: short documents (<= 3 tokens) must not crash the shingle
  * expression (Spark's sequence(0,-1) is DESCENDING, which used to feed
  * slice a zero/negative index), and every doc must appear in the q36
  * per-doc summary even with an empty shingle set. */
class DedupRobustnessSpec extends SparkSpec {

  private def corpusDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shortdocs").toString
    Seq(
      (0L, "one", "en", "srcA", 3L),
      (1L, "two words", "en", "srcA", 9L),
      (2L, "exactly three tokens", "en", "srcA", 20L),
      (3L, "now four whole tokens", "en", "srcA", 21L),
      (4L, "a b c d e f g h", "en", "srcB", 15L),
      (5L, "a b c d e f g h", "en", "srcB", 15L) // exact dup of 4
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q36 minhash: short docs survive and all docs appear once") {
    val out = graft.SparkEntry.queries("q36_minhash_lsh")(spark, corpusDir())
      .collect()
    assert(out.length == 6, s"expected 6 per-doc rows, got ${out.length}")
    val dup = out.filter(r => r.getAs[Long]("doc_id") >= 4)
    assert(dup.forall(_.getAs[Long]("n_candidates") >= 1),
      "identical docs should be LSH candidates of each other")
  }

  test("q38 jaccard: short docs yield no pairs with NaN/crash; identical docs = 1.0") {
    val rows = graft.SparkEntry.queries("q38_ngram_jaccard")(spark, corpusDir())
      .collect()
    assert(rows.forall(r => !r.getAs[Double]("jaccard").isNaN))
    val identical = rows.find(r =>
      r.getAs[Long]("doc_a") == 4L && r.getAs[Long]("doc_b") == 5L)
    assert(identical.exists(_.getAs[Double]("jaccard") == 1.0))
  }

  test("q36 hot-bucket guard: a 1000-copy cluster yields bounded pairs, one row per doc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hotbucket").toString
    val n = 1000
    val clones = (0L until n.toLong).map(i =>
      (i, "the same near duplicate document body repeated verbatim", "en", "srcHot", 50L))
    val normal = (n.toLong until n.toLong + 5).map(i =>
      (i, s"unique document number $i with its own distinct words here", "en", "srcCold", 55L))
    (clones ++ normal).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("q36_minhash_lsh")(spark, dir).collect()
    assert(out.length == n + 5, s"expected ${n + 5} per-doc rows, got ${out.length}")

    // Unguarded, the 1000-doc bucket self-joins to n(n-1)/2 = 499,500 pairs
    // (sum of candidates ≈ 999,000). The rep cap bounds total pairs by
    // MaxBucketReps * n, i.e. candidate-slot sum ≤ 2 * MaxBucketReps * n.
    val candSum = out.map(_.getAs[Long]("n_candidates")).sum
    assert(candSum <= 2L * DedupQueries.MaxBucketReps * (n + 5),
      s"hot bucket went quadratic: sum(n_candidates)=$candSum")
    // ...but every clone must still be CONNECTED to the cluster (≥1 candidate)
    assert(out.filter(_.getAs[Long]("doc_id") < n)
      .forall(_.getAs[Long]("n_candidates") >= 1),
      "capping must not orphan cluster members")
  }

  test("shingle count is n-2 (last 3-gram included)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("a b c d").toDF("text")
    val grams = df.select(expr(
      "array_distinct(transform(" +
        "filter(sequence(0, greatest(size(split(text, ' ')) - 2, 1) - 1), " +
        "i -> i < size(split(text, ' ')) - 2), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))"))
      .collect().head.getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))
  }
}
