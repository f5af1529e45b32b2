package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Wall-clock evidence for the SkewOps scale story (SCALE.md): on a
  * deliberately hot-keyed distribution, measure the unsalted plan against
  * its salted twin. Results are recorded in BASELINE.md §skew.
  *
  * Shapes measured (all materialized through the noop sink — full execution,
  * no driver collect):
  *  - inner join, 80%-hot left key, right too big to broadcast:
  *    unsalted with AQE skew handling OFF (the planner-blind case SkewOps
  *    targets), unsalted with AQE ON (the runtime's own mitigation, for
  *    honest comparison), and saltedInnerJoin.
  *  - COUNT(DISTINCT v) BY key where the hot key holds millions of distinct
  *    values: plain countDistinct (second-stage shuffle sends every distinct
  *    value of the hot key to one reducer) vs saltedDistinctCount.
  *
  * Each timing is the median of 3 runs, printed as one JSON line. Pass
  * config names as args (e.g. `runMain graft.SkewBench join_unsalted_noaqe`)
  * to measure a subset — one config per fresh JVM is the clean way to
  * compare: in a shared JVM the later configs inherit GC/codegen state and
  * drift run-to-run.
  */
object SkewBench {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def median3(body: => Unit): Double = {
    val ts = (1 to 3).map(_ => timed(body)).sorted
    ts(1)
  }

  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // the no-broadcast regime
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nLeft = 32000000L
    val nRight = 200000L
    val coldKeys = 200000

    // 80% of left rows share key 0; the rest spread uniformly. `value` is the
    // row id, so the hot key carries ~25M DISTINCT values — the shape where
    // combiners cannot shrink the hot reducer's input. Sized so the hot
    // partition's single-task work dominates fixed costs: skew mitigation
    // only pays when the straggler IS the wall-clock (at 4M rows the salted
    // plans measured SLOWER — overhead without a straggler to kill).
    val left = spark.range(nLeft).select(
      when(pmod(hash(col("id")), lit(10)) < 8, 0L)
        .otherwise(pmod(hash(col("id") * 31), lit(coldKeys)).cast("long")).as("key"),
      col("id").as("value")).cache()
    val right = spark.range(nRight).select(
      col("id").as("rkey"), (col("id") * 2).as("rval")).cache()
    mat(left); mat(right) // warm the cache out of the timings
    // JIT/codegen warmup on an unmeasured join so the first measured config
    // doesn't pay compilation
    mat(left.limit(100000).join(right, left.limit(100000)("key") === right("rkey")))

    def aqe(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
    }

    val configs: Seq[(String, () => Unit)] = Seq(
      "join_unsalted_noaqe" -> (() => { aqe(false)
        mat(left.join(right, left("key") === right("rkey"))) }),
      "join_salted_noaqe" -> (() => { aqe(false)
        mat(SkewOps.saltedInnerJoin(left, right, "key", "rkey")) }),
      "join_unsalted_aqe" -> (() => { aqe(true)
        mat(left.join(right, left("key") === right("rkey"))) }),
      "join_salted_aqe" -> (() => { aqe(true)
        mat(SkewOps.saltedInnerJoin(left, right, "key", "rkey")) }),
      "distinct_unsalted" -> (() => { aqe(true)
        mat(left.groupBy("key").agg(count_distinct(col("value")).as("distinct_value"))) }),
      "distinct_salted" -> (() => { aqe(true)
        mat(SkewOps.saltedDistinctCount(left, Seq("key"), "value")) }),
      "sum_unsalted" -> (() => { aqe(true)
        mat(left.groupBy("key").agg(sum(col("value")).as("sum_value"))) }),
      "sum_salted" -> (() => { aqe(true)
        mat(SkewOps.saltedSum(left, Seq("key"), "value")) }))

    val selected =
      if (args.isEmpty) configs else configs.filter(c => args.contains(c._1))
    val results = selected.map { case (name, body) => name -> median3(body()) }

    def f(d: Double): String = BigDecimal(d).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    spark.stop()
    println(results.map { case (n, v) => s"\"$n\":${f(v)}" }
      .mkString(s"""{"metric":"skew_bench","unit":"sec","rows_left":$nLeft,""", ",", "}"))
  }
}
