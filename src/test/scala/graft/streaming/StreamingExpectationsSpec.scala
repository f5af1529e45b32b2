package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations.Rule._

/** StreamingExpectations: per-batch rule reports land in the DQ log with
  * correct counts, breaches flags exactly the offending batches, and
  * at-least-once replays collapse on read. */
class StreamingExpectationsSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(name)
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private val rules = Seq(
    NotNull("ccy"),
    InSet("ccy", Seq("GBP", "USD")),
    Between("amt", 0.0, 100.0))

  test("per-batch reports: clean batch passes, dirty batch counts its violations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dest = freshDir("dq_log")
    val input = MemoryStream[(Option[String], Double)]
    val q = StreamingExpectations.monitor(
      input.toDS().toDF("ccy", "amt"), rules, dest,
      freshDir("dq_ckpt"))
    try {
      input.addData((Some("GBP"), 10.0), (Some("USD"), 20.0)) // clean
      q.processAllAvailable()
      input.addData((Some("ZZZ"), -5.0), (None, 10.0), (Some("GBP"), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rep = StreamingExpectations.readReports(spark, dest)
      .collect()
      .map(r => (r.getLong(5), r.getString(0)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // schema order: rule, target, n_violations, n_rows, passed, batch_id
    assert(rep((0L, "not_null")) === ((0L, 2L, 1L)))
    assert(rep((0L, "in_set")) === ((0L, 2L, 1L)))
    assert(rep((0L, "between")) === ((0L, 2L, 1L)))
    assert(rep((1L, "not_null")) === ((1L, 3L, 0L)))
    assert(rep((1L, "in_set")) === ((2L, 3L, 0L))) // ZZZ + NULL
    assert(rep((1L, "between")) === ((1L, 3L, 0L))) // -5
  }

  test("breaches flags only batches at/over the threshold; replays collapse") {
    import spark.implicits._
    val dest = freshDir("dq_log2")
    val clean = Seq((Some("GBP"), 1.0), (Some("USD"), 2.0)).toDF("ccy", "amt")
    val dirty = Seq((Some("ZZZ"), 1.0), (Some("ZZZ"), 2.0), (Some("GBP"), 3.0))
      .toDF("ccy", "amt")
    StreamingExpectations.applyBatch(clean, 0L, rules, dest)
    StreamingExpectations.applyBatch(dirty, 1L, rules, dest)
    // at-least-once replay of batch 1: identical rows append again
    StreamingExpectations.applyBatch(dirty, 1L, rules, dest)
    val rep = StreamingExpectations.readReports(spark, dest)
    assert(rep.count() === rules.size * 2L, "replayed batch must collapse")
    // dirty batch: 2/3 in_set violations >= 0.5 share; clean batch: 0
    val b = StreamingExpectations.breaches(spark, dest, "in_set", "ccy", 0.5)
      .select("batch_id").collect().map(_.getLong(0)).toSeq
    assert(b === Seq(1L))
  }

  test("empty batches write no report rows") {
    import spark.implicits._
    val dest = freshDir("dq_log3")
    StreamingExpectations.applyBatch(
      Seq.empty[(Option[String], Double)].toDF("ccy", "amt"), 0L, rules, dest)
    assert(!new java.io.File(dest).exists() ||
      new java.io.File(dest).listFiles().forall(!_.getName.endsWith(".parquet")))
  }
}
