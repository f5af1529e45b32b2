package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.PostingsIndex

/** Incremental index maintenance — the daily-delta contract:
  *
  *  - PostingsIndex: build(base) + append(delta) produces BYTE-EQUAL table
  *    CONTENTS and probe results to build(base ∪ delta) — incremental is
  *    exactly the rebuild, at delta-proportional cost (doc-keyed tables
  *    append; term-keyed tables merge at vocabulary size);
  *  - VectorIndex: append assigns new vectors to the FROZEN stored
  *    quantizer (the IVF serving contract between explicit retrains —
  *    assignment semantics cannot drift as a side effect of ingest) and
  *    probes surface delta candidates immediately;
  *  - the streaming hook (indexedBatch) keeps the postings index equal to
  *    a rebuild over everything it landed, across micro-batch boundaries.
  */
class IncrementalIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tableSet(root: String, t: String): Set[String] =
    spark.read.parquet(s"$root/$t").collect().map(_.toString).toSet

  private def probeRows(root: String, terms: Seq[String]): Seq[String] =
    PostingsIndex.probe(spark, root, terms).collect().map(_.toString).toSeq

  test("PostingsIndex: build(base) + append(delta) == build(all), table for table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val inc = Files.createTempDirectory("graft-inc").toString
    val full = Files.createTempDirectory("graft-full").toString
    PostingsIndex.build(docs.filter(col("doc_id") < 350), inc)
    PostingsIndex.append(
      docs.filter(col("doc_id") >= 350 && col("doc_id") < 450), inc)
    PostingsIndex.append(docs.filter(col("doc_id") >= 450), inc)
    PostingsIndex.build(docs, full)
    for (t <- Seq("postings", "docstats", "termdf", "corpus"))
      assert(tableSet(inc, t) == tableSet(full, t),
        s"table $t diverged between incremental and rebuild")
    for (terms <- Seq(Seq("query", "dup", "scan"), Seq("the", "data")))
      assert(probeRows(inc, terms) == probeRows(full, terms),
        s"probe($terms) diverged between incremental and rebuild")
  }

  test("VectorIndex: append assigns under the frozen quantizer; probes see the delta") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    try {
      VectorIndex.build(emb.filter(col("vec_id") < 400), "vinc")
      val before = spark.table("vinc_cells").select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // delta: the remaining corpus tail + an exact clone of vector 3
      val clone = emb.filter(col("vec_id") === 3)
        .select(lit(9999L).as("vec_id"), col("embedding"))
      VectorIndex.append(spark, "vinc",
        emb.filter(col("vec_id") >= 400).unionByName(clone))
      val after = spark.table("vinc_cells").select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after.size == 501, s"expected 400 base + 100 delta + clone, got ${after.size}")
      before.foreach { case (id, cell) =>
        assert(after(id) == cell, s"append moved base vector $id") }
      // frozen-quantizer contract: every delta cell == argmax-dot against
      // the STORED centroids, recomputed independently here
      val cents = spark.table("vinc_centroids")
      val expected = SimilarityQueries.ivfAssign(
          emb.filter(col("vec_id") >= 400).unionByName(clone)
            .select(col("vec_id"), SimilarityQueries.asDouble("embedding").as("v"))
            .withColumn("norm", expr("sqrt(graft_dot(v, v))")),
          cents)
        .select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      expected.foreach { case (id, cell) =>
        assert(after(id) == cell, s"delta vector $id not assigned to frozen cell") }
      // the clone shares vector 3's cell and must surface at rank 1 for
      // query 3 with cosine 1.0 — delta candidates are probe-visible NOW
      assert(after(9999L) == after(3L), "clone landed in a different cell")
      val top = VectorIndex.probe(spark, "vinc",
          emb.filter(col("vec_id") === 3), nProbe = 6, topK = 5)
        .filter(col("rank") === 1).collect()
      assert(top.length == 1 && top(0).getAs[Long]("cand_id") == 9999L &&
        top(0).getAs[Double]("cos_sim") == 1.0,
        s"clone not surfaced at rank 1: ${top.mkString(",")}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS vinc_centroids")
      spark.sql("DROP TABLE IF EXISTS vinc_cells")
    }
  }

  test("streaming hook: incremental postings index == rebuild over landed survivors") {
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val clones = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val c = docs.unionByName(clones)
    val r = Files.createTempDirectory("graft-ing").toString
    graft.streaming.StreamingDocIngest.indexedBatch(
      c.filter(col("doc_id") < 30), s"$r/out", s"$r/sig", s"$r/idx",
      None, None, 0.6)
    graft.streaming.StreamingDocIngest.indexedBatch(
      c.filter(col("doc_id") >= 30), s"$r/out", s"$r/sig", s"$r/idx",
      None, None, 0.6)
    val landed = spark.read.parquet(s"$r/out").select("doc_id", "text")
    // clones were near-dup-dropped: the index absorbed survivors only
    assert(landed.filter(col("doc_id") >= 10000).count() == 0)
    val rebuilt = Files.createTempDirectory("graft-ing-full").toString
    PostingsIndex.build(landed, rebuilt)
    for (t <- Seq("postings", "docstats", "termdf", "corpus"))
      assert(tableSet(s"$r/idx", t) == tableSet(rebuilt, t),
        s"streaming-maintained $t diverged from rebuild over survivors")
    assert(probeRows(s"$r/idx", Seq("query", "dup", "scan")) ==
      probeRows(rebuilt, Seq("query", "dup", "scan")))
  }

  test("streaming hook: SetSimIndex maintained across batches == frozen-order appends") {
    // the third persisted structure rides the same ingest hook: build the
    // prefix index on a BASE, stream two survivor batches through
    // indexedBatch with setSimRoot set, and the maintained index must
    // find the same matches as explicit appends of the same survivors
    // (the frozen-order soundness SetSimIndexSpec pins) — and a probe
    // must surface a delta clone of a base doc at jaccard 1.0
    import graft.dedup.{DedupQueries, SetSimIndex}
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text")
    val base = docs.filter(col("doc_id") < 100)
    val stream1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 130)
    val stream2 = docs.filter(col("doc_id") >= 130 && col("doc_id") < 160)
      .unionByName(base.filter(col("doc_id") === 5)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    def grams(df: org.apache.spark.sql.DataFrame) =
      DedupQueries.hashedGramsOf(df).select("doc_id", "grams_h", "n_grams")
    val r = Files.createTempDirectory("graft-ssi-stream").toString
    SetSimIndex.build(grams(base), s"$r/ss", tau = 0.5)
    graft.streaming.StreamingDocIngest.indexedBatch(
      stream1, s"$r/out", s"$r/sig", s"$r/idx", None, Some(s"$r/ss"), 0.6)
    graft.streaming.StreamingDocIngest.indexedBatch(
      stream2, s"$r/out", s"$r/sig", s"$r/idx", None, Some(s"$r/ss"), 0.6)
    // twin: explicit appends of the SAME landed survivors
    val landed = spark.read.parquet(s"$r/out").select("doc_id", "text")
    val twin = Files.createTempDirectory("graft-ssi-twin").toString
    SetSimIndex.build(grams(base), s"$twin/ss", tau = 0.5)
    SetSimIndex.append(spark, s"$twin/ss", grams(landed), tau = 0.5)
    val probe = grams(docs.filter(col("doc_id") >= 400 && col("doc_id") < 440)
      .unionByName(base.filter(col("doc_id") === 7)
        .select((col("doc_id") + 30000).as("doc_id"), col("text"))))
    val got = SetSimIndex.probe(spark, s"$r/ss", probe, tau = 0.5)
    val want = SetSimIndex.probe(spark, s"$twin/ss", probe, tau = 0.5)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming-maintained SetSimIndex diverged from explicit appends")
    // the probe clone of base doc 7 must match it at jaccard 1.0
    val hit = got.filter(col("doc_b") === 30007L && col("doc_a") === 7L)
      .collect()
    assert(hit.length == 1 && hit(0).getAs[Double]("jaccard") == 1.0,
      s"clone probe missed its base twin: ${hit.mkString(",")}")
  }
  test("PqIndex: append encodes under the frozen codebook; probes see the delta") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    try {
      PqIndex.build(emb.filter(col("vec_id") < 400), "pqinc")
      val before = spark.table("pqinc_codes").select("vec_id", "code")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val cbBefore = spark.table("pqinc_codebook").collect().map(_.toString).toSet
      // delta: the corpus tail + an exact clone of vector 3
      val clone = emb.filter(col("vec_id") === 3)
        .select(lit(9999L).as("vec_id"), col("embedding"))
      PqIndex.append(spark, "pqinc",
        emb.filter(col("vec_id") >= 400).unionByName(clone))
      val after = spark.table("pqinc_codes").select("vec_id", "code")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(after.size == 501, s"expected 400 base + 100 delta + clone, got ${after.size}")
      before.foreach { case (id, code) =>
        assert(after(id) == code, s"append changed base code $id") }
      // the codebook is FROZEN: append must not touch it
      assert(spark.table("pqinc_codebook").collect().map(_.toString).toSet
        == cbBefore, "append retrained the codebook")
      // identical vectors encode to identical codes under the frozen book
      assert(after(9999L) == after(3L), "clone encoded differently from its twin")
      // delta candidates are probe-visible now: the clone re-ranks at
      // exact L2 distance 0 for query 3 (its twin), rank 2 only to the
      // twin itself (d2 ties break on vec_id asc). The corpus frame
      // supplies re-rank point-lookup vectors, so it must carry the
      // delta too (at scale: the source store, which always does).
      val top = PqIndex.probe(spark, "pqinc", emb.unionByName(clone))
        .filter(col("query_id") === 3 && col("cand_id") === 9999L).collect()
      assert(top.length == 1 && top(0).getAs[Double]("l2_d2") == 0.0,
        s"clone not surfaced for its twin query: ${top.mkString(",")}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS pqinc_codebook")
      spark.sql("DROP TABLE IF EXISTS pqinc_codes")
    }
  }
}
