package graft.text

import graft.SparkSpec

/** q253 — the composed end-to-end pretraining pipeline. The hash gate
  * proves the whole composition against the relational replay; this spec
  * pins the CROSS-STAGE accounting identities the manifest must satisfy
  * by construction, so a future refactor of any stage that breaks the
  * chain fails here with a named identity instead of an opaque hash red.
  */
class PretrainE2eSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val row = {
    val df = TextQueries.pretrainE2e(spark, sf)
    (df.columns.toSeq, df.collect()(0))
  }
  private def v(name: String): Long = row._2.getLong(row._1.indexOf(name))

  test("front 13 columns equal q245's manifest (same crawl, same curation)") {
    val q245 = graft.SparkEntry.queries("q245_warc_gz_front_door")(spark, sf)
    val cols = q245.columns.toSeq
    val r245 = q245.collect()(0)
    cols.foreach { c =>
      assert(v(c) == r245.getLong(cols.indexOf(c)),
        s"column $c drifted between q253's front half and q245")
    }
  }

  test("packing conserves tokens: packed_tokens == n_bpe_tokens") {
    assert(v("packed_tokens") == v("n_bpe_tokens"))
  }

  test("block count is exactly ceil(n_bpe_tokens / 512), contiguous from 0") {
    assert(v("n_blocks") == (v("n_bpe_tokens") + 511) / 512)
    assert(v("max_block_id") == v("n_blocks") - 1)
  }

  test("encode accounting: merges = bytes - tokens, within byte/word bounds") {
    assert(v("n_merges_applied") == v("n_bytes") - v("n_bpe_tokens"))
    // byte-BPE: every word yields >= 1 token (no OOV) and <= its bytes,
    // so whitespace token count <= BPE token count <= byte count
    assert(v("kept_tokens") <= v("n_bpe_tokens"))
    assert(v("n_bpe_tokens") <= v("n_bytes"))
    assert(v("n_merges_applied") >= 0L)
  }

  test("every kept doc reaches packing: block_docs_sum >= kept_docs") {
    // each doc spans >= 1 block; the sum over blocks of per-block doc
    // membership therefore bounds kept_docs from above
    assert(v("block_docs_sum") >= v("kept_docs"))
    assert(v("kept_docs") > 0L, "fixture must curate a non-empty corpus")
  }
}
