package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q242b's cut-training scale contract (VERDICT r13 #1 — the previous
  * doc_id % 7 rule was a corpus-proportional fraction ranked through an
  * unpartitioned window; at 100 TB that is a ~14 TB single-partition
  * sort). Pins:
  *  - the draw is a FIXED-N top-N: sample size == min(cap, n) whatever
  *    the corpus size;
  *  - the draw's physical plan is TakeOrderedAndProject — bounded heap
  *    per partition, bounded driver merge — never a global Sort;
  *  - the draw is the exact (md5(doc_id), doc_id) order statistics an
  *    independent driver-side computation produces (the DuckDB oracle
  *    replays the same rule);
  *  - the served q242b frame itself carries NO window and no sort: the
  *    cuts ship as plan literals over the scored corpus. */
class Q242bCutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sample is a fixed-N draw: size == min(cap, n) and exactly the " +
    "cap smallest (md5(doc_id), doc_id) rows") {
    import spark.implicits._
    val scored = (1L to 100L).map(i => (i, i.toDouble / 7.0))
      .toDF("doc_id", "kn_score")
    val cap = 16L
    val got = TextQueries.knCutSample(scored, cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 16, s"cap must bind: ${got.size}")
    val exp = (1L to 100L).sortBy(i => (md5hex(i.toString), i))
      .take(16).toSet
    assert(got == exp, s"draw must be the md5-order top-N: $got vs $exp")
    // corpus smaller than the cap: the whole corpus is the sample
    val small = (1L to 5L).map(i => (i, 0.0)).toDF("doc_id", "kn_score")
    assert(TextQueries.knCutSample(small, cap).count() == 5)
  }

  test("draw plan is TakeOrderedAndProject (bounded top-N), not a " +
    "global sort; the served q242b frame has no window and no sort") {
    import spark.implicits._
    val scored = (1L to 100L).map(i => (i, i.toDouble))
      .toDF("doc_id", "kn_score")
    val drawPlan = TextQueries.knCutSample(scored, 16L)
      .queryExecution.executedPlan.toString
    assert(drawPlan.contains("TakeOrderedAndProject"),
      s"cut-training draw lost its top-N plan:\n$drawPlan")
    assert(!drawPlan.contains("GlobalLimit"),
      s"draw must not run sort + separate limit:\n$drawPlan")
    val served = graft.SparkEntry
      .queries("q242b_kn_gate_approx_cuts")(spark, sf)
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"q242b's served plan must carry the cuts as literals, no window:\n$p")
    assert(!p.contains("Sort "),
      s"q242b's served plan must not sort the corpus:\n$p")
    // and the cut literals really gate: all three buckets materialize
    // on the sf0.001 corpus
    val buckets = served.select("bucket").distinct()
      .collect().map(_.getString(0)).toSet
    assert(buckets == Set("head", "middle", "tail"), s"buckets: $buckets")
  }
}
