package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class BloomPruneSpec extends SparkSpec {

  private def sketchBytes(df: org.apache.spark.sql.DataFrame,
      col: String, n: Long, fpp: Double): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    df.stat.bloomFilter(col, n, fpp).writeTo(out)
    out.toByteArray
  }

  test("no false negatives: every member key passes the sketch probe") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = (0L until 5000L).map(_ * 7L).toDF("k")
    val bytes = sketchBytes(dim, "k", 5000L, 0.01)
    val pass = dim
      .filter(call_function("graft_bloom_contains", $"k", lit(bytes)))
      .count()
    assert(pass == 5000L, s"bloom dropped ${5000L - pass} member keys")
  }

  test("false-positive rate on a disjoint key set stays near the target fpp") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = (0L until 5000L).map(_ * 7L).toDF("k")
    val bytes = sketchBytes(dim, "k", 5000L, 0.01)
    // probe 20k keys guaranteed NOT multiples of 7
    val probes = (0L until 20000L).map(_ * 7L + 3L).toDF("k")
    val fp = probes
      .filter(call_function("graft_bloom_contains", $"k", lit(bytes)))
      .count()
    val rate = fp.toDouble / 20000.0
    assert(rate < 0.05, f"false-positive rate $rate%.4f >> target 0.01")
  }

  test("semiJoin is exact: bloom false positives are removed by the join") {
    import spark.implicits._
    val fact = (0L until 10000L).map(i => (i, i % 97L)).toDF("k", "payload")
    val dim = (0L until 5000L by 13L).toDF("d")
    val got = BloomPrune.semiJoin(fact, "k", dim, "d", fpp = 0.2) // high fpp on purpose
      .select("k", "payload")
    val want = fact.join(dim.select($"d".as("k")).distinct(), Seq("k"), "left_semi")
      .select("k", "payload")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bloom semi join diverged from the exact semi join")
  }

  test("semiJoin rejects non-integral keys loudly (no silent empty result)") {
    import spark.implicits._
    // a string key would cast to NULL in the long probe and silently drop
    // every row — the guard must throw instead
    val fact = Seq(("a", 1L), ("b", 2L)).toDF("k", "payload")
    val dim = Seq("a", "b").toDF("d")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(fact, "k", dim, "d")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    val factL = Seq((1L, "x")).toDF("k", "payload")
    val e2 = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(factL, "k", dim, "d")
    }
    assert(e2.getMessage.contains("dim key"), e2.getMessage)
    // integral widths narrower than long still pass the guard
    val factI = Seq((1, "x"), (26, "y")).toDF("k", "payload")
    val dimI = Seq(1, 13, 26).toDF("d")
    assert(BloomPrune.semiJoin(factI, "k", dimI, "d").count() == 2)
  }

  test("interpreted eval agrees with codegen (wholestage off vs on)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = (0L until 2000L).map(_ * 11L).toDF("k")
    val bytes = sketchBytes(dim, "k", 2000L, 0.01)
    val probes = spark.range(20000).select($"id".as("k"))
    def hits(): Long = probes
      .filter(call_function("graft_bloom_contains", $"k", lit(bytes)))
      .count()
    val withCodegen = hits()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(hits() == withCodegen,
      "interpreted bloom probe diverged from the codegen path")
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("the bloom probe sits below the semi join (prunes before the exchange)") {
    import spark.implicits._
    // spark.range, not a local Seq: Catalyst eagerly evaluates filters over
    // LocalRelation, which would erase the probe node this test asserts on
    val fact = spark.range(1000).select($"id".as("k"))
    val dim = (0L until 100L by 3L).toDF("d")
    val p = BloomPrune.semiJoin(fact, "k", dim, "d")
      .queryExecution.executedPlan.toString
    val probeIdx = p.indexOf("graft_bloom_contains")
    val joinIdx = p.indexOf("Join")
    assert(probeIdx >= 0, s"bloom probe missing from the plan:\n$p")
    assert(joinIdx >= 0, s"semi join missing from the plan:\n$p")
    // tree print: children appear BELOW their parent — the probe filter
    // must be in the join's probe-side subtree, not above the join
    assert(probeIdx > joinIdx, s"bloom probe did not push below the join:\n$p")
  }
}
