package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Upsert

/** StreamingUpsert: the continuous merge sink must (1) converge to the
  * same table as a one-shot batch merge over all updates (latest-wins
  * across micro-batch boundaries); (2) be IDEMPOTENT under at-least-once
  * replay — re-applying a delivered batch is a row-for-row no-op (this is
  * where the sink's exactly-once claim lives); (3) move a key that
  * changes partition without leaving a stale copy behind. */
class StreamingUpsertSpec extends SparkSpec {

  private def rows(dest: String): Set[(Long, String, Long, String)] = {
    spark.read.parquet(dest)
      .select(col("id"), col("part").cast("string"), col("ver"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
  }

  test("multi-batch stream == one-shot batch merge; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_supsert_").toString
    val dest = s"$dir/base"
    val ck = s"$dir/ck"
    val b1 = Seq((1L, "p1", 1L, "a1"), (2L, "p1", 1L, "b1"), (3L, "p2", 1L, "c1"))
    val b2 = Seq((2L, "p1", 2L, "b2"), (4L, "p2", 1L, "d1"))
    val b3 = Seq((1L, "p1", 3L, "a3"), (3L, "p2", 0L, "cSTALE")) // late arrival loses
    val input = MemoryStream[(Long, String, Long, String)]
    val updates = input.toDS().toDF("id", "part", "ver", "payload")
    val q = StreamingUpsert.sink(updates, dest, Seq("id"), "ver", "part", ck)
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val expected = Upsert.merged(
      (b1 ++ b2 ++ b3).toDF("id", "part", "ver", "payload"),
      spark.emptyDataset[(Long, String, Long, String)]
        .toDF("id", "part", "ver", "payload"),
      Seq("id"), "ver")
      .select(col("id"), col("part"), col("ver"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(rows(dest) == expected, "stream result != one-shot batch merge")
    assert(rows(dest).map(_._1) == Set(1L, 2L, 3L, 4L))
    // at-least-once replay: re-apply the LAST delivered batch verbatim
    val before = rows(dest)
    StreamingUpsert.applyBatch(b3.toDF("id", "part", "ver", "payload"),
      dest, Seq("id"), "ver", "part")
    assert(rows(dest) == before, "replaying a delivered batch changed the table")
  }

  test("a key that moves partition leaves no stale copy") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_supsert_mv_").toString
    val dest = s"$dir/base"
    StreamingUpsert.applyBatch(
      Seq((1L, "p1", 1L, "v1")).toDF("id", "part", "ver", "payload"),
      dest, Seq("id"), "ver", "part")
    StreamingUpsert.applyBatch(
      Seq((1L, "p2", 2L, "v2")).toDF("id", "part", "ver", "payload"),
      dest, Seq("id"), "ver", "part")
    assert(rows(dest) == Set((1L, "p2", 2L, "v2")),
      "old-partition copy must be removed when a key moves")
  }
}
