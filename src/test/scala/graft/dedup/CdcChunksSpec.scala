package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q220 (content-defined chunking) — pins the property that justifies
  * CDC over fixed-offset chunking: boundary RE-SYNC under insertion. A
  * prefix edit shifts every byte, yet all chunks after the first
  * breakpoint following the edit must be bit-identical between the two
  * versions (shared md5s), because breakpoints are functions of local
  * content, not position. Also pins the partition invariants (chunks
  * tile the document exactly) and determinism. */
class CdcChunksSpec extends SparkSpec {

  private def chunks(rows: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] = {
    import spark.implicits._
    DedupQueries.cdcChunkTable(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  test("chunks tile the document: lengths sum to n, order is contiguous") {
    val text = graft.analytics.Ops.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val byDoc = chunks(text)
    val lens = text.toMap.view.mapValues(_.length.toLong).toMap
    assert(byDoc.keySet == text.map(_._1).toSet)
    byDoc.foreach { case (id, cs) =>
      assert(cs.map(_._2).sum == lens(id), s"doc $id chunks don't tile")
      assert(cs.map(_._1) == cs.indices.map(_.toLong), s"doc $id idx gap")
      assert(cs.forall(_._2 > 0), s"doc $id empty chunk")
    }
    // the breakpoint rule actually fires on the fixture
    assert(byDoc.values.exists(_.size > 1), "no document ever chunked")
  }

  test("insertion re-sync: a prefix edit preserves all post-breakpoint chunks") {
    // a long fixture doc vs the same doc with a prefix insertion — every
    // chunk strictly after the first breakpoint following the edit must
    // survive the shift byte-for-byte
    val base = graft.analytics.Ops.t(spark, "/root/testdata/sf0.001", "documents")
      .orderBy(desc("n_chars")).select("text").head().getString(0)
    val edited = "zq inserted noise " + base
    val byDoc = chunks(Seq((1L, base), (2L, edited)))
    val (a, b) = (byDoc(1L), byDoc(2L))
    assert(a.size >= 3, s"fixture doc too short to chunk (${a.size})")
    // chunks of the ORIGINAL after its first breakpoint (i.e. all but
    // chunk 0) must all reappear in the edited version's chunk set —
    // the first breakpoint inside the unchanged suffix re-syncs both
    // cut sequences, and breakpoints are content-local from there on
    val aTail = a.drop(1).map(_._3)
    val bSet = b.map(_._3).toSet
    val surviving = aTail.count(bSet)
    assert(surviving == aTail.size,
      s"re-sync failed: only $surviving/${aTail.size} post-breakpoint " +
        "chunks survived a prefix insertion")
    // and the edit DID change the leading chunk (the spec has teeth)
    assert(a.head._3 != b.head._3)
  }

  test("determinism") {
    val rows = Seq((7L, "the quick brown fox jumps over the lazy dog " * 8))
    assert(chunks(rows) == chunks(rows))
  }

  test("graft_cdc_chunks == legacy HOF expression (r14 parity, incl. unicode)") {
    // The compiled expression must be BIT-IDENTICAL to the pre-r14
    // higher-order-function chain it replaced — on the fixture corpus
    // AND on multi-byte / astral-plane / short / empty edge inputs,
    // where codepoint-vs-byte confusion would diverge first.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val fixture = graft.analytics.Ops
      .t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(60)
    val edge = Seq(
      (9001L, ""), (9002L, "short"), (9003L, "exactly8"),
      (9004L, "café naïve résumé über alles, ein Straßenfest mit Musik"),
      (9005L, "世界你好 " * 12),
      (9006L, "mixed ascii éèê and 😀 astral 😁 plane chars repeated " * 4),
      (9007L, "a" * 100))
      .toDF("doc_id", "text")
    val docs = fixture.unionByName(edge)
    val newForm = docs.select(col("doc_id"),
      expr("graft_cdc_chunks(text)").as("cs"))
    val oldForm = docs.select(col("doc_id"),
      expr(DedupQueries.legacyCdcChunksExpr).as("cs"))
    val diff = newForm.exceptAll(oldForm).count() +
      oldForm.exceptAll(newForm).count()
    assert(diff == 0, s"compiled vs legacy chunk expression diverged ($diff rows)")
  }
}
