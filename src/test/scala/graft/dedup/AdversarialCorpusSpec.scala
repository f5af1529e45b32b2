package graft.dedup

import java.nio.file.Files

import graft.SparkSpec

/** Every documents-table query must survive an adversarial corpus — empty
  * strings, whitespace-only, unicode/emoji, control chars, a pathological
  * long doc, 1-char docs — without crashing (Spark 4 ANSI mode turns
  * sloppy arithmetic into runtime errors) and with one output row per doc
  * where the query contract is per-doc. */
class AdversarialCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-adversarial").toString
    val longDoc = (1 to 5000).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, "", "en", "srcA", 0L),                       // empty
      (1L, "   ", "en", "srcA", 3L),                    // whitespace only
      (2L, "éèê café naïve", "fr", "srcA", 20L), // accents
      (3L, "😀 😀 😀 emoji text here", "en", "srcA", 25L), // emoji
      (4L, "tab\there\nnewline", "en", "srcB", 17L),    // control chars
      (5L, longDoc, "en", "srcB", longDoc.length.toLong), // pathological length
      (6L, "a", "en", "srcB", 1L),                      // single char
      (7L, "a", "en", "srcB", 1L),                      // exact dup of 6
      (8L, "price: 42,99 € ab@cd.ef", "de", "srcB", 24L) // digits + email + €
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val perDocQueries = Seq(
    "q30_text_stats", "q31_quality_score", "q32_lang_id", "q33_fingerprint",
    "q34_binary_meta", "q36_minhash_lsh", "q37_simhash",
    "q45_regex_tokens", "q51_hash_sample", "q60_redact")

  private val otherDocQueries = Seq(
    "q38_ngram_jaccard", "q44_token_topk", "q50_tfidf", "q57_dup_clusters")

  test("q35_dedup_exact: one row per distinct content (8 clusters for 9 docs)") {
    val rows = graft.SparkEntry.queries("q35_dedup_exact")(spark, dir).collect()
    assert(rows.length == 8) // docs 6 and 7 share one cluster
  }

  perDocQueries.foreach { q =>
    test(s"$q survives the adversarial corpus") {
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      // per-doc contract: every doc represented (q51 samples a subset)
      if (q != "q51_hash_sample")
        assert(rows.length == 9, s"$q returned ${rows.length} rows, expected 9")
    }
  }

  otherDocQueries.foreach { q =>
    test(s"$q survives the adversarial corpus (shape-free)") {
      graft.SparkEntry.queries(q)(spark, dir).collect() // must not throw
    }
  }

  test("exact dup still detected among adversarial docs") {
    val out = graft.SparkEntry.queries("q35_dedup_exact")(spark, dir)
      .filter("cluster_size = 2").collect()
    assert(out.length == 1 && out.head.getAs[Long]("keeper_doc_id") == 6L)
  }
}
