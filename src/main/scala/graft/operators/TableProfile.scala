package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level table profiling — the crawler/catalog statistics pass
  * (row count, null count, distinct cardinality, min/max) the reference
  * delegates to its catalog crawler (`/root/reference` README's Glue
  * crawler step) and every lake operator runs after a load to sanity-check
  * a table and feed the optimizer's stats.
  *
  * Shape per column: ONE global aggregate over a scan pruned to THAT
  * column — `n_rows, n_nulls, n_distinct, min, max` in a single pass, so
  * profiling k columns reads k single-column page streams (parquet
  * column pruning, plan-visible in ReadSchema), never k full-table scans.
  * The per-column 1-row results union into the stacked (col_name, stats)
  * frame. All stats surface as STRING so one schema fits every column
  * type (the q100 portability argument).
  *
  * Exact vs approximate: [[profile]] uses exact COUNT(DISTINCT) — two
  * bounded exchanges per column (value-keyed partial-distinct, then the
  * 1-row fold) — and is the oracle-gated form. At 100 TB cardinality is
  * what you approximate: [[profileApprox]] swaps in HyperLogLog++
  * (`approx_count_distinct`, rsd 1.6% default) whose partial sketches
  * fold map-side, collapsing the distinct stage to the same blobs-not-rows
  * posture as the q82/q108 sketch rollups. Same output schema, so callers
  * flip one flag when the table outgrows exact counting.
  */
object TableProfile {

  private def statsFor(df: DataFrame, c: String, distinct: Column2): DataFrame =
    df.select(col(c)).groupBy().agg(
      lit(c).as("col_name"),
      count(lit(1)).as("n_rows"),
      count(when(col(c).isNull, 1)).as("n_nulls"),
      distinct(c).as("n_distinct"),
      min(col(c)).cast("string").as("min_repr"),
      max(col(c)).cast("string").as("max_repr"))
    .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")

  private type Column2 = String => org.apache.spark.sql.Column

  /** Exact profile of `cols` (default: every column) — one row per column. */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "TableProfile: no columns to profile")
    cs.map(c => statsFor(df, c, x => countDistinct(col(x))))
      .reduce(_.unionByName(_))
  }

  /** HLL++ cardinality variant — the 100 TB path (rsd = relative error). */
  def profileApprox(df: DataFrame, cols: Seq[String] = Seq.empty,
      rsd: Double = 0.016): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "TableProfile: no columns to profile")
    cs.map(c => statsFor(df, c, x => approx_count_distinct(col(x), rsd)))
      .reduce(_.unionByName(_))
  }
}
