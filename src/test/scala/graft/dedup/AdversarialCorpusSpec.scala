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
    "q45_regex_tokens", "q51_hash_sample", "q60_redact", "q65_repetition",
    "q66_shard_pack", "q77_unigram_lm", "q89_global_ids",
    "q131_gopher_gates", "q132_bpe_encode",
    "q152_dsir_weights", "q155_leakage_split",
    // chat rendering must survive empty/1-token docs (n_user clamps)
    "q174_chat_template",
    // NFC normalization: the constructed suffix is non-ASCII by design;
    // the accent/emoji docs additionally exercise the non-fast path
    "q246_nfc_normalize")

  private val otherDocQueries = Seq(
    "q38_ngram_jaccard", "q44_token_topk", "q50_tfidf", "q57_dup_clusters",
    "q62_dup_clusters_lsh", "q64_contamination", "q69_stratified_sample",
    "q70_incremental_dedup", "q75_bpe_train", "q78_bpe_batch",
    "q92_heavy_hitters", "q93_source_overlap", "q94_sequence_pack",
    "q95_containment",
    // round-7 documents-scan additions: ANSI-safe on degenerate docs
    "q109_split_manifest", "q110_interdup_coverage", "q111_bigram_lm",
    "q130_segment_dedup", "q135_weighted_sample", "q137_vocab_oov",
    "q138_simhash_blocks", "q141_setsim_join", "q142_pmi",
    "q143_dataset_card", "q149_setsim_incremental", "q151_winnowing",
    "q153_source_kl", "q154_theta_overlap",
    // round-7 continuation batch: removal dedup (empty/whitespace docs
    // drop from tokenization on both engines), NB (single-class prior
    // guard), planning/fit (per-source / 1-row shapes)
    "q161_substr_dedup", "q163_naive_bayes", "q164_epoch_mix",
    "q165_zipf_fit", "q166_substr_incremental",
    // agreement matrix composes three member pipelines; media queries
    // build payloads from doc_ids; q172/q173 must reassemble degenerate
    // docs (empty, 1-token, pathological-length) without ANSI errors
    "q167_dedup_agreement", "q170_image_ahash", "q171_pair_curation",
    "q172_span_corruption", "q173_fim",
    // q174-q179 batch: pair construction (1-doc groups drop), stump
    // binning (clamped bins on the pathological doc), EL2N (trains on
    // 9 docs), fertility/truncation (empty-text sums stay defined)
    "q175_preference_pairs", "q176_decision_stump", "q177_data_diet",
    "q178_tokenizer_fertility", "q179_truncation_loss",
    // conformal degrades to cover-everything on a tiny calibration
    // slice; DP release and DoReMi handle degenerate sources
    "q180_conformal", "q181_dp_release", "q182_doremi_mix",
    // r12 batch: byte BPE handles emoji/accents (multi-byte chars span
    // several hex symbols — the byte-fallback property itself) and the
    // empty/whitespace docs drop from the word table on both engines;
    // ExactSubstr handles docs shorter than the window, the 5000-token
    // pathological doc, and the exact-dup pair (docs 6/7, <50 tokens —
    // correctly NOT span-deduped)
    "q247_byte_bpe_train", "q248_byte_bpe_encode", "q249_exact_substr",
    // the incremental + indexed forms share q249's core; the md5 delta
    // split and the per-dir index build must survive the 9-doc corpus
    "q251_exact_substr_incremental", "q252_exact_substr_indexed",
    // IR eval degrades to all-zero metrics when no doc matches a query
    // term; bootstrap handles tiny corpora (replica weights can zero out)
    "q184_retrieval_eval", "q185_bootstrap_ci",
    // experiment readout and label QA handle degenerate arms/labels
    "q186_ab_test", "q188_label_noise",
    // agreement/KS/MI handle single-class and degenerate-bin corpora;
    // temperature fit clamps ln away from 0/1 on extreme logits
    "q189_model_kappa", "q190_ks_test", "q191_mi_features",
    "q197_temperature")

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

  test("q65: all-repeat doc has rep_fraction near 1, short docs exactly 0") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-rep").toString
    Seq(
      (0L, Seq.fill(100)("same same same").mkString(" "), "en", "s", 0L), // one distinct 3-gram
      (1L, "just two", "en", "s", 8L),                                    // < 3 tokens
      (2L, (1 to 50).map(i => s"u$i").mkString(" "), "en", "s", 0L)       // all distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("q65_repetition")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("rep_fraction")).toMap
    assert(rows(0L) > 0.99, s"all-repeat doc scored ${rows(0L)}")
    assert(rows(1L) == 0.0)
    assert(rows(2L) == 0.0)
  }

  test("q75: a corpus with no adjacent pairs stops merging instead of crashing") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-nopairs").toString
    Seq((0L, "solo", "en", "s", 4L), (1L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("q75_bpe_train")(spark, d).collect()
    assert(rows.isEmpty, s"expected an empty merge table, got ${rows.length} rows")
  }

  test("q75: merging exhausts gracefully when fewer than 3 rounds are possible") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-fewpairs").toString
    // exactly one adjacent pair corpus-wide: round 1 merges it, round 2
    // finds nothing and stops — the merge table has one row
    Seq((0L, "left right", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("q75_bpe_train")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "left right", 1L)))
  }

  test("q64: a gram present in EVERY train doc is DF-capped out of the join") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-hotgram").toString
    // 200 docs all share the hot trigram; each also has unique grams.
    // q64's md5 split (<= '0a') puts ~4% of them in the eval set.
    val hot = "common shared trigram"
    val docs = (0L until 200L).map(i =>
      (i, s"$hot u${i}a u${i}b u${i}c u${i}d", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.SparkEntry.queries("q64_contamination")(spark, d).collect()
    // the hot gram appears in ~168 train docs (> MaxGramDf=64) -> excluded;
    // unique grams never collide -> NO contamination pairs survive. Without
    // the cap every eval doc would "contaminate" against all 168 train docs.
    assert(out.isEmpty,
      s"DF cap failed: ${out.length} pairs emitted from a stopword-only overlap")
  }
}
