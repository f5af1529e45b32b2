package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-order computations WITHOUT the single-partition global window.
  *
  * `row_number()/sum() OVER (ORDER BY ...)` with an empty PARTITION BY
  * pulls the entire table through one Exchange SinglePartition — one task
  * sorts and scans everything, the canonical 100 TB killer. Both
  * operators here use the same two-pass shape instead:
  *
  *  1. range-partition on the order key (partition i holds a contiguous
  *     slice of the global order) and compute the quantity LOCALLY per
  *     partition — a narrow projection (monotonic ids) or a
  *     pid-partitioned window (running sums), never a global one;
  *  2. aggregate one row per partition (count / weight total), cumulate
  *     those few rows into per-partition offsets — the only
  *     single-partition work is over partition COUNT, not rows — and
  *     broadcast-join the offsets back.
  *
  * Determinism: the caller's order columns must form a UNIQUE key (ties
  * would make both the distributed and the single-partition form
  * nondeterministic). Results are stable under task retry because
  * everything derives from the explicit range partition + local sort.
  *
  * Backing for catalog q89 (row numbers) and q94 (running token offsets);
  * PlanContractSpec build-enforces the no-full-data-window shape through
  * those queries.
  */
object GlobalOrder {

  /** `df` + contiguous 1-based `out` column numbering rows in
    * `orderCols` order. One range exchange + narrow monotonic-id
    * projection on the data path. */
  def withRowNumbers(df: DataFrame, orderCols: Seq[Column],
      numPartitions: Int = 32, out: String = "global_id"): DataFrame = {
    val base = df
      .repartitionByRange(numPartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__go_mid", monotonically_increasing_id())
      .withColumn("__go_pid", shiftrightunsigned(col("__go_mid"), 33).cast("int"))
    val offW = Window.orderBy("__go_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__go_pid").agg(count(lit(1)).as("__go_cnt"))
      .withColumn("__go_off", coalesce(sum(col("__go_cnt")).over(offW), lit(0L)))
      .select("__go_pid", "__go_off")
    base.join(broadcast(offsets), "__go_pid")
      .withColumn(out,
        col("__go_off") + (col("__go_mid") % (1L << 33)) + 1L)
      .drop("__go_mid", "__go_pid", "__go_off")
  }

  /** `df` + exclusive/inclusive running totals of `weight` in `orderCols`
    * order: `startCol` = total weight strictly before the row, `endCol` =
    * including it. One range exchange + a pid-PARTITIONED cumsum window
    * (bounded per partition) on the data path. */
  def withRunningTotals(df: DataFrame, orderCols: Seq[Column], weight: Column,
      startCol: String = "tstart", endCol: String = "tend",
      numPartitions: Int = 32): DataFrame = {
    val base = df
      .withColumn("__go_w", weight)
      .repartitionByRange(numPartitions, orderCols: _*)
      .withColumn("__go_pid", spark_partition_id())
    val wLoc = Window.partitionBy("__go_pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withEnd = base.withColumn("__go_le", sum(col("__go_w")).over(wLoc))
    val offW = Window.orderBy("__go_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__go_pid").agg(sum(col("__go_w")).as("__go_pw"))
      .withColumn("__go_off", coalesce(sum(col("__go_pw")).over(offW), lit(0L)))
      .select("__go_pid", "__go_off")
    withEnd.join(broadcast(offsets), "__go_pid")
      .withColumn(endCol, col("__go_off") + col("__go_le"))
      .withColumn(startCol, col(endCol) - col("__go_w"))
      .drop("__go_w", "__go_pid", "__go_le", "__go_off")
  }
}
