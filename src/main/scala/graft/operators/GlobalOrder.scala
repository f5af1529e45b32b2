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
  *     those few rows into per-partition offsets via a broadcast non-equi
  *     self-join (pid' < pid) — NO window at all, so nothing in the plan
  *     is single-partition, not even over the partition-count rows — and
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

  /** Exclusive prefix-sums over the per-partition totals WITHOUT a window:
    * broadcast non-equi self-join (every pid sums the totals of strictly
    * lower pids) + re-aggregate. Quadratic in the PARTITION COUNT (≤32² =
    * bounded metadata), zero single-partition stages, zero WindowExec —
    * the shape survives any data scale because its input is one row per
    * partition, never data. */
  private def exclusiveOffsets(perPid: DataFrame, totalCol: String): DataFrame =
    // Both references to `perPid` (and the caller's base path) sit in ONE
    // job over the SAME canonical range exchange, which Spark's exchange
    // reuse dedupes to a single shuffle at runtime. Do NOT checkpoint the
    // aggregate to "save" a scan: a checkpoint splits the offsets into a
    // separate job, repartitionByRange re-SAMPLES its boundaries per job,
    // and offsets pinned under one boundary set silently misalign with a
    // base path partitioned under another (caught by GlobalOrderSpec).
    perPid.join(
        broadcast(perPid.select(col("__go_pid").as("__go_pid2"),
          col(totalCol).as("__go_t2"))),
        col("__go_pid2") < col("__go_pid"), "left")
      .groupBy("__go_pid")
      .agg(coalesce(sum(col("__go_t2")), lit(0L)).as("__go_off"))

  /** `df` + contiguous 1-based `out` column numbering rows in
    * `orderCols` order. One range exchange + narrow monotonic-id
    * projection on the data path.
    *
    * COMPOSITION RULE (q201's regression lesson): do NOT chain a second
    * withRowNumbers directly over the OUTPUT of a first one. The second
    * pass's offsets branch and base branch then both embed the first
    * pass's range exchange with DIFFERENT pruned schemas; when that
    * defeats exchange reuse, each branch re-samples the first exchange's
    * boundaries independently, the two executions assign different
    * monotonic ids, and the chained ranks silently misalign (observed as
    * quintile drift at sf0.1 on 15k rows — smaller SFs can pass). To
    * rank one frame by several orders, pin the base (localCheckpoint),
    * run INDEPENDENT withRowNumbers passes over the pinned frame, select
    * (key, rank) from each, and equi-join them back — the q201 shape. */
  def withRowNumbers(df: DataFrame, orderCols: Seq[Column],
      numPartitions: Int = 32, out: String = "global_id"): DataFrame = {
    val base = df
      .repartitionByRange(numPartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__go_mid", monotonically_increasing_id())
      .withColumn("__go_pid", shiftrightunsigned(col("__go_mid"), 33).cast("int"))
    val offsets = exclusiveOffsets(
      base.groupBy("__go_pid").agg(count(lit(1)).as("__go_cnt")), "__go_cnt")
    base.join(broadcast(offsets), "__go_pid")
      .withColumn(out,
        col("__go_off") + (col("__go_mid") % (1L << 33)) + 1L)
      .drop("__go_mid", "__go_pid", "__go_off")
  }

  /** Rank ONE frame by SEVERAL orders — the composition rule above made
    * API, so the chained-misuse shape is impossible to write: the base is
    * pinned internally (localCheckpoint — every pass reads the SAME
    * materialized rows, so no branch can re-sample range boundaries), each
    * order gets an INDEPENDENT withRowNumbers pass over the pinned frame,
    * and the rank columns come back via equi-joins on `key`. Also saves
    * re-executing the upstream pipeline once per order (the q184 lesson:
    * two unpinned passes ran the whole BM25 stack twice).
    *
    * `key` must uniquely identify rows (same contract as the order
    * columns); each `orders` entry is (order columns, output rank name). */
  def withRowNumbersMulti(df: DataFrame, key: Seq[String],
      orders: Seq[(Seq[Column], String)],
      numPartitions: Int = 32): DataFrame = {
    require(orders.nonEmpty, "withRowNumbersMulti needs at least one order")
    require(orders.map(_._2).distinct.size == orders.size,
      "duplicate output rank column names")
    val pinned = df.localCheckpoint(true)
    orders.foldLeft(pinned) { case (acc, (orderCols, out)) =>
      acc.join(
        withRowNumbers(pinned, orderCols, numPartitions, out)
          .select((key.map(col) :+ col(out)): _*),
        key)
    }
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
    val offsets = exclusiveOffsets(
      base.groupBy("__go_pid").agg(sum(col("__go_w")).as("__go_pw")), "__go_pw")
    withEnd.join(broadcast(offsets), "__go_pid")
      .withColumn(endCol, col("__go_off") + col("__go_le"))
      .withColumn(startCol, col(endCol) - col("__go_w"))
      .drop("__go_w", "__go_pid", "__go_le", "__go_off")
  }
}
