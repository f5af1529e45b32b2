package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{call_function, col, lit}

import graft.functions.GraftFunctions

/** Bloom-prefiltered exact semi join.
  *
  * The broadcast-hash semi join dies when the build side's exact key set no
  * longer fits in executor memory; the plain shuffled semi join then moves
  * the ENTIRE probe side across the network even when only a few percent of
  * it survives. This operator threads the needle: build a BloomFilter
  * sketch of the dim keys (distributed, via `df.stat.bloomFilter`'s
  * tree-aggregated build — only the fixed-size bit array comes back to the
  * driver, ~1.2 MB per 1M keys at 1% fpp), prefilter the probe side with a
  * codegen'd [[graft.functions.BloomMightContain]] BEFORE its exchange,
  * then run the exact semi join on the survivors. False positives (≤ fpp of
  * the pruned-away mass) are removed by the exact join, so the result is
  * identical to the plain semi join — the sketch only cuts shuffle volume,
  * by ~the join selectivity.
  *
  * Spark's AQE injects runtime bloom filters for this same reason
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only when its
  * size/stats thresholds line up; this operator is the explicit, always-on
  * form with a caller-chosen fpp, usable where the optimizer's heuristics
  * don't fire (e.g. the dim side is a subquery AQE can't cost).
  */
object BloomPrune {

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, bloom-pruned.
    *
    * Runs one tiny count job + one sketch-build job over `dim` up front
    * (both distributed aggregations — no row collect). `dim` is re-read for
    * the exact join; at scale, pass a cached/selective dim projection.
    */
  def semiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // The sketch probes LONG keys (graft_bloom_contains hashes the long
    // representation). A non-integral key would cast to NULL, the probe
    // filter would drop every row, and the "exact semi join" would
    // silently return empty — fail loudly instead of wrong-answering.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    for ((df, key, side) <- Seq((fact, factKey, "fact"), (dim, dimKey, "dim"))) {
      val dt = df.schema(key).dataType
      require(integral.contains(dt),
        s"$side key '$key' must be an integral type for the bloom probe " +
          s"(got ${dt.simpleString}); cast it explicitly or use a plain semi join")
    }
    GraftFunctions.register(fact.sparkSession)
    // expectedNumItems sizes the bit array; counting first costs one
    // columnar agg over dim and keeps the sketch at its target fpp
    // (guessing low silently degrades fpp, guessing high wastes memory).
    val n = math.max(dim.count(), 1L)
    val sketch = dim.stat.bloomFilter(dimKey, n, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      sketch.writeTo(out)
      out.toByteArray
    }
    val pruned = fact.filter(
      call_function("graft_bloom_contains", col(factKey).cast("long"), lit(bytes)))
    pruned.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
  }
}
