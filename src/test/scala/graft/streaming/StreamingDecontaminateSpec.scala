package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingDecontaminate: a replay of the train split must reproduce the
  * batch q203 verdicts EXACTLY, invariant to micro-batch splits — the
  * stage is stateless against the fixed eval gram set, so parity is by
  * shared definition (the StreamingScore pattern, spec-enforced here). */
class StreamingDecontaminateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("replayed stream verdicts == batch q203, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 2) <= "0a"
    val evalPath = java.nio.file.Files
      .createTempDirectory("graft-decon-eval").toString + "/grams"
    StreamingDecontaminate.buildEvalGrams(docs.filter(isEval), evalPath)

    val trainRows = docs.filter(!isEval).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = graft.SparkEntry.queries("q203_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("shared_eval_grams"),
          r.getAs[Long]("dropped")))).toMap

    for (nBatches <- Seq(1, 5)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-decon-$nBatches").toString
      val input = MemoryStream[(Long, String)]
      val q = StreamingDecontaminate.ingest(
        input.toDS().toDF("doc_id", "text"),
        evalPath, s"$root/out", s"$root/ckpt")
      q.awaitTermination() // AvailableNow with no data: terminates
      val per = math.max(1, trainRows.length / nBatches + 1)
      trainRows.grouped(per).foreach { chunk =>
        input.addData(chunk.toSeq)
        val q2 = StreamingDecontaminate.ingest(
          input.toDS().toDF("doc_id", "text"),
          evalPath, s"$root/out", s"$root/ckpt")
        q2.awaitTermination()
      }
      val got = spark.read.parquet(s"$root/out")
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("shared_eval_grams"),
            r.getAs[Long]("dropped")))).toMap
      assert(got == expected,
        s"$nBatches-batch decontamination replay diverged from batch q203")
    }
  }
}
