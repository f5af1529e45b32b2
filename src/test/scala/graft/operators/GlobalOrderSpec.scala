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
