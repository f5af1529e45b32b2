package graft.similarity

import graft.SparkSpec

/** Fidelity contract for q104 (index-served hybrid retrieval) vs q88
  * (exact corpus-rank hybrid retrieval):
  *
  *  - in the FULL-PROBE limit (nProbe = k: every IVF cell probed, topN
  *    covering both arms) the composition reproduces q88's top-15
  *    EXACTLY, row for row — the recomposition over the persisted
  *    indexes is faithful; approximation enters ONLY through nProbe;
  *  - at serving parameters (nProbe=6, topN=100) overlap@15 holds the
  *    measured floor (11/15 at sf0.001, 10/15 at sf0.01 — RRF's tail
  *    is docs mediocre in both arms, exactly where IVF recall bites);
  *  - the lexical arm is pure truncation, never reordering: its ranks
  *    equal q88's exact lex ranks for every doc it returns.
  */
class HybridIndexedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def top15(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq

  test("full-probe limit reproduces q88's top-15 exactly (ordered)") {
    val q88 = top15(graft.SparkEntry.queries("q88_hybrid_rrf")(spark, sf))
    val full = top15(SimilarityQueries.hybridIndexed(spark, sf,
      nProbe = 20, topN = 1 << 20))
    assert(full == q88,
      s"full-probe hybrid diverged from q88: got $full want $q88")
  }

  test("serving parameters hold the measured overlap floor vs q88") {
    val q88 = top15(graft.SparkEntry.queries("q88_hybrid_rrf")(spark, sf)).toSet
    val serving = top15(
      graft.SparkEntry.queries("q104_hybrid_indexed")(spark, sf)).toSet
    val overlap = (q88 & serving).size
    assert(overlap >= 10, s"overlap@15 dropped to $overlap/15 (measured 11/15)")
  }

  test("lexical arm truncates but never reorders: probe ranks == q88 lex ranks") {
    import org.apache.spark.sql.functions._
    val probeRanks = graft.operators.GlobalOrder.withRowNumbers(
        graft.text.PostingsIndex.probe(spark,
          graft.IndexCache.ensure(spark, sf)._1,
          Seq("query", "dup", "scan"), k = 100),
        Seq(col("bm25").desc, col("doc_id").asc), out = "r_lex")
      .select(col("doc_id"), col("r_lex"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactRanks = graft.operators.GlobalOrder.withRowNumbers(
        graft.text.TextQueries.bm25MicroScores(spark, sf),
        Seq(col("s").desc, col("doc_id").asc), out = "r")
      .select(col("doc_id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probeRanks.nonEmpty && probeRanks.size <= 100)
    probeRanks.foreach { case (doc, r) =>
      assert(exactRanks(doc) == r,
        s"doc $doc: probe rank $r != exact corpus rank ${exactRanks(doc)}")
    }
  }

  test("q104 is deterministic across invocations (stored index reused, no retrain)") {
    val a = graft.SparkEntry.queries("q104_hybrid_indexed")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("q104_hybrid_indexed")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
