package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GlobalOrder vs the single-partition window forms it replaces: same
  * answers on a shuffled frame, for both row numbering and running
  * totals (the catalog's q89/q94 pin the plan shape; this pins the
  * operator API directly). */
class GlobalOrderSpec extends SparkSpec {

  private def frame = spark.range(10000).select(
    (col("id") * 2654435761L % 100000L).as("k"), // scrambled unique keys
    (col("id") % 97L + 1L).as("w"))

  test("withRowNumbers equals row_number() over the global order") {
    val got = GlobalOrder.withRowNumbers(frame, Seq(col("k")))
      .select("k", "global_id")
    val want = frame.select(col("k"),
      row_number().over(Window.orderBy("k")).cast("long").as("global_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "distributed row numbers diverged from the window form")
  }

  test("withRowNumbersMulti: all orders rank the SAME pinned rows (chained-misuse impossible)") {
    // q201's regression class: two chained withRowNumbers passes could
    // rank DIFFERENT executions of a nondeterministic-boundary base.
    // Through the Multi API the base is pinned once, so every rank column
    // must agree with the window form computed on the same frame — and
    // with each other row-for-row via the join key.
    val got = GlobalOrder.withRowNumbersMulti(frame, Seq("k"), Seq(
      (Seq(col("k").asc), "r_asc"),
      (Seq(col("k").desc), "r_desc"),
      (Seq(col("w").asc, col("k").asc), "r_w")))
    val n = frame.count()
    // complementary orders over a pinned base must mirror exactly
    assert(got.filter(col("r_asc") + col("r_desc") =!= n + 1).isEmpty,
      "asc/desc ranks disagree -> the two passes ranked different rows")
    val want = frame.select(col("k"),
      row_number().over(Window.orderBy(col("k").asc)).cast("long").as("r_asc"),
      row_number().over(Window.orderBy(col("k").desc)).cast("long").as("r_desc"),
      row_number().over(Window.orderBy(col("w").asc, col("k").asc)).cast("long")
        .as("r_w"))
    val g = got.select("k", "r_asc", "r_desc", "r_w")
    assert(g.exceptAll(want).isEmpty && want.exceptAll(g).isEmpty,
      "multi ranks diverged from the window forms")
  }

  test("withRowNumbersMulti rejects duplicate output names") {
    intercept[IllegalArgumentException] {
      GlobalOrder.withRowNumbersMulti(frame, Seq("k"), Seq(
        (Seq(col("k").asc), "r"), (Seq(col("w").asc), "r")))
    }
  }

  test("withRunningTotals equals sum() over the global order (exclusive/inclusive)") {
    val got = GlobalOrder.withRunningTotals(frame, Seq(col("k")), col("w"))
      .select("k", "tstart", "tend")
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val want = frame.select(col("k"),
      (sum(col("w")).over(w) - col("w")).as("tstart"),
      sum(col("w")).over(w).as("tend"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "distributed running totals diverged from the window form")
  }
}
