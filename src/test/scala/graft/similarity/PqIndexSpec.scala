package graft.similarity

import graft.SparkSpec

/** The persisted PQ index (q243) against its inline twin (q239): probe ==
  * inline is STRUCTURAL (both run pqAdcShortlistRerank; parquet
  * round-trips the codebook doubles bit-exactly), and this spec pins it
  * as BIT equality — plus the layout contract (one compressed row per
  * vector, M=8 codes each drawn from the K=16 codeword id space). */
class PqIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("l2_d2")))
      .sortBy(t => (t._1, t._2))

  test("probe against the stored layout reproduces the inline q239 bit-exactly") {
    assert(rows("q243_pq_served").toSeq == rows("q239_pq_adc").toSeq)
  }

  test("codes table: one row per vector, 8 codes each, ids in the codeword space") {
    val name = graft.IndexCache.ensurePq(spark, sf)
    val codes = spark.table(s"${name}_codes").collect()
    assert(codes.length == 500, "one compressed row per corpus vector")
    codes.foreach { r =>
      val c = r.getSeq[Int](r.fieldIndex("code"))
      assert(c.length == 8, "M=8 subspace codes per vector")
      assert(c.forall(cid => cid >= 0 && cid < 16),
        "codes must index the K=16 codeword space")
    }
    val cb = spark.table(s"${name}_codebook").collect()
    assert(cb.length <= 128 && cb.length >= 8,
      "codebook is M*K bounded metadata (empty codewords may drop)")
  }
}
