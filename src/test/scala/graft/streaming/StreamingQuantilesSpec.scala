package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingQuantiles: the per-source KLL monitor must (1) accumulate
  * state correctly ACROSS micro-batches — the state blob round-trips
  * through serialize/heapify every batch, so multi-batch equality with a
  * one-shot batch computation pins the whole persistence path; (2) in the
  * exact regime (< k values per source) match exact order statistics,
  * i.e. stream == batch == truth; (3) snapshot n monotonically. */
class StreamingQuantilesSpec extends SparkSpec {

  /** Inclusive-rule exact quantile (KllSketchSpec's definition). */
  private def exactQuantile(sorted: Array[Double], r: Double): Double =
    sorted(math.max(0, math.ceil(r * sorted.length).toInt - 1))

  test("multi-batch stream matches exact order statistics per source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two sources, 300 values each, delivered across 3 batches — all far
    // below k=2048, so the sketch retains everything (exact regime)
    val valsA = (1 to 300).map(i => ((i * 7919) % 977).toDouble)
    val valsB = (1 to 300).map(i => ((i * 104729) % 1013).toDouble)
    val input = MemoryStream[(String, Double)]
    val docs = input.toDS().toDF("source", "n_chars")
    val q = StreamingQuantiles.monitor(docs)
      .writeStream.format("memory").queryName("quantiles_out")
      .outputMode("update").start()
    try {
      valsA.grouped(100).zip(valsB.grouped(100)).foreach { case (a, b) =>
        input.addData(a.map(("srcA", _)) ++ b.map(("srcB", _)))
        q.processAllAvailable()
      }
      // update mode appends one snapshot per (source, batch); latest = max n
      val latest = spark.table("quantiles_out")
        .orderBy(col("n_docs").desc)
        .collect().groupBy(_.getString(0)).map { case (s, rs) => s -> rs.head }
      val sortedA = valsA.sorted.toArray
      val sortedB = valsB.sorted.toArray
      assert(latest("srcA").getLong(1) == 300L)
      assert(latest("srcB").getLong(1) == 300L)
      assert(latest("srcA").getDouble(2) == exactQuantile(sortedA, 0.5))
      assert(latest("srcA").getDouble(3) == exactQuantile(sortedA, 0.9))
      assert(latest("srcA").getDouble(4) == exactQuantile(sortedA, 0.99))
      assert(latest("srcB").getDouble(2) == exactQuantile(sortedB, 0.5))
      assert(latest("srcB").getDouble(4) == exactQuantile(sortedB, 0.99))
      // three batches -> three snapshots per source, n strictly increasing
      val snapsA = spark.table("quantiles_out")
        .filter(col("source") === "srcA").select("n_docs")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(snapsA == Seq(100L, 200L, 300L),
        s"expected monotone per-batch snapshots, got $snapsA")
    } finally q.stop()
  }

  test("stream final state equals one-shot batch accumulation (parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val vals = (1 to 500).map(i => (if (i % 2 == 0) "even" else "odd",
      ((i * 48271) % 4000).toDouble))
    val input = MemoryStream[(String, Double)]
    val q = StreamingQuantiles.monitor(input.toDS().toDF("source", "n_chars"))
      .writeStream.format("memory").queryName("quantiles_parity")
      .outputMode("update").start()
    try {
      vals.grouped(137).foreach { chunk => // uneven batch cuts
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("quantiles_parity")
        .orderBy(col("n_docs").desc)
        .collect().groupBy(_.getString(0))
        .map { case (s, rs) => s -> (rs.head.getLong(1), rs.head.getDouble(2),
          rs.head.getDouble(3), rs.head.getDouble(4)) }
      val batch = vals.toDF("source", "n_chars")
        .groupBy("source")
        .agg(expr("graft_kll_agg(CAST(n_chars AS DOUBLE), 2048)").as("sk"))
        .select(col("source"), expr("graft_kll_n(sk)").as("n"),
          expr("graft_kll_quantiles(sk, array(0.5D, 0.9D, 0.99D))").as("qs"))
        .collect().map(r => r.getString(0) -> (r.getLong(1),
          r.getSeq[Double](2)(0), r.getSeq[Double](2)(1), r.getSeq[Double](2)(2)))
        .toMap
      assert(streamed == batch,
        s"stream/batch divergence:\n$streamed\nvs\n$batch")
    } finally q.stop()
  }
}
