package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{call_function, col, greatest, least, lit}

import graft.functions.GraftFunctions

/** Z-order (Morton-curve) data layout for multi-dimensional min/max
  * skipping.
  *
  * A table range-sorted on ONE column prunes parquet row groups / files on
  * that column only; a query filtering any OTHER dimension scans the whole
  * table. Writing in Z-order — range-partition + locally sort by the
  * bit-interleaved [[graft.functions.ZOrder2]] key — makes every contiguous
  * slice of the layout a bounded box in BOTH dimensions, so footer min/max
  * statistics skip data for filters on either column (or both). This is the
  * lakehouse `OPTIMIZE ZORDER BY` idea, built from Spark primitives:
  * one range exchange (sampled bounds, AQE-compatible), a narrow codegen
  * projection for the key, and a local sort — no extra shuffle beyond what
  * any clustered rewrite pays.
  *
  * The tradeoff is explicit: vs a 1-D sort, each dimension's per-slice
  * bound widens from ~1/files to ~1/sqrt(files) of its domain (bits are
  * shared between dimensions) — Z-order wins whenever queries filter more
  * than one clustering dimension. ZOrderSpec pins both sides of that
  * tradeoff on a grid corpus.
  *
  * Dims are bounded to 16 bits here (the write saturate-clamps) so
  * layout keys match the overflow-free shift/mask arithmetic a SQL engine
  * (the DuckDB oracle twin, q91) can reproduce; a production caller with
  * wider domains quantizes (e.g. `((v - min) * 65535 / range)`) first —
  * skipping only needs rank order, not exact values.
  */
object ZOrderLayout {

  /** Interleaved sort key for two dimension columns, CLAMPED to the
    * 16-bit domain [0, 65535] — a true clamp, not a modulo: `% 65536`
    * would WRAP out-of-range values onto small keys (65536 co-clustering
    * with 0, breaking rank order exactly where skipping needs it) and
    * hand negative inputs' low bits to all 64 z-bits. Clamping saturates
    * out-of-range dims at the domain edge: correctness is unaffected
    * (layout only drives skipping) and in-range rank order is preserved;
    * callers with wider domains quantize first, as the scaladoc above
    * prescribes. */
  def zkey(a: Column, b: Column): Column = {
    def clamp16(c: Column): Column =
      least(greatest(c.cast("long"), lit(0L)), lit(65535L))
    call_function("graft_zorder", clamp16(a), clamp16(b))
  }

  /** Rewrite `df` into `numFiles` z-clustered parquet files at `path`. */
  def write(
      df: DataFrame,
      dimA: Column,
      dimB: Column,
      path: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    GraftFunctions.register(df.sparkSession)
    df.withColumn("__graft_z", zkey(dimA, dimB))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
