package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import Expectations.Rule._

  private def report(rules: Seq[Expectations.Rule]) = {
    import spark.implicits._
    val df = Seq(
      (1L, Some("GBP"), Some(10.0), "ok-1"),
      (2L, Some("USD"), Some(-5.0), "ok-2"), // between violation
      (3L, None, Some(20.0), "ok-3"),        // not_null + in_set violation
      (3L, Some("ZZZ"), Some(30.0), "bad 4"), // dup key + in_set + matches
      (5L, Some("EUR"), None, "ok-5")         // between violation (null)
    ).toDF("id", "ccy", "amt", "tag")
    Expectations.check(df, rules)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  test("each rule counts exactly its violations, nulls included") {
    val rep = report(Seq(
      NotNull("ccy"),
      InSet("ccy", Seq("GBP", "USD", "EUR")),
      Between("amt", 0.0, 100.0),
      Matches("tag", "^ok-"),
      Unique(Seq("id"))))
    assert(rep(("not_null", "ccy")) === ((1L, 5L, 0L)))
    // NULL must count as an in_set violation (NOT IN semantics would skip it)
    assert(rep(("in_set", "ccy")) === ((2L, 5L, 0L)))
    // -5 below lo, NULL amt cannot satisfy the range
    assert(rep(("between", "amt")) === ((2L, 5L, 0L)))
    assert(rep(("matches", "tag")) === ((1L, 5L, 0L)))
    // 5 rows, 4 distinct ids
    assert(rep(("unique", "id")) === ((1L, 5L, 0L)))
  }

  test("passing rules report passed=1 with zero violations") {
    val rep = report(Seq(Between("amt", -100.0, 100.0), NotNull("id")))
    assert(rep(("between", "amt")) === ((1L, 5L, 0L))) // null amt still violates
    assert(rep(("not_null", "id")) === ((0L, 5L, 1L)))
  }

  test("failures lists only failing rules; empty when suite passes") {
    import spark.implicits._
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Expectations.failures(clean,
      Seq(NotNull("v"), Unique(Seq("id")))).isEmpty)
    val fails = Expectations.failures(clean.unionAll(clean),
      Seq(NotNull("v"), Unique(Seq("id"))))
    assert(fails === Seq(("unique", "id", 2L)))
  }

  test("the whole suite is one scan: single aggregate over the input") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.0)).toDF("id", "v", "a")
    val plan = Expectations.check(df, Seq(
      NotNull("v"), Between("a", 0, 10), Unique(Seq("id"))))
      .queryExecution.optimizedPlan
    // exactly one scan of the source in the optimized plan: conditional
    // aggs + the distinct count share it (Expand), never a second read
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.getClass.getSimpleName.contains("Relation") => r
    }
    assert(scans.size === 1, s"expected one scan, got:\n$plan")
  }

  test("empty rule suite is rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq.empty)
    }
  }
}
