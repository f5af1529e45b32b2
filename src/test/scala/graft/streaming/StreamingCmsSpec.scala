package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingCms: the per-source count-min monitor is the one streaming
  * sketch whose stream==batch parity is EXACT (counters are sums; sums
  * are associative/commutative), so the final stream snapshot must equal
  * the q210 batch sketch EXACTLY — same estimates, same lifetime counts —
  * after any micro-batch interleaving. Also pins the JVM-side bucket
  * derivation against q210's SQL idiom: if the two ever drift, the
  * "union stream counters with batch counter tables by addition" story
  * silently breaks. */
class StreamingCmsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("JVM bucket positions equal the SQL md5 idiom for every (token, depth)") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val w = graft.text.TextQueries.cmsWidth
    (0 until graft.text.TextQueries.cmsDepth).foreach { d =>
      val sqlPos = toks.select(col("tok"),
        (conv(substring(md5(concat(col("tok"), lit(s":$d"))), 1, 15), 16, 10)
          .cast("long") % w).as("pos"))
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      sqlPos.foreach { case (tok, p) =>
        assert(StreamingCms.pos(tok, d, w) == p,
          s"JVM/SQL bucket drift for ($tok, $d)")
      }
    }
  }

  test("multi-batch stream snapshot equals the q210 batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.SparkEntry.queries("q210_cms_freq")(spark, sf).collect()
    val probes = batch.map(_.getAs[String]("token")).distinct.toSeq.sorted
    assert(probes.length == 10)
    val expected = batch.map(r => (r.getAs[String]("source"),
      r.getAs[String]("token")) -> r.getAs[Long]("cms_n")).toMap

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val input = MemoryStream[(String, String)]
    val stream = input.toDS().toDF("source", "text")
    val q = StreamingCms.monitor(stream, probes)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.map(d => (d._2, d._3)))
        q.processAllAvailable()
      }
      val snaps = spark.table("cms_out").collect()
      // latest snapshot per (source, token) = the one with max n_tokens
      val latest = snaps.groupBy(r => (r.getAs[String]("source"),
        r.getAs[String]("token")))
        .map { case (k, rs) => k -> rs.maxBy(_.getAs[Long]("n_tokens")) }
      assert(latest.keySet == expected.keySet,
        "stream must cover exactly the batch (source, probe) surface")
      latest.foreach { case (k, r) =>
        assert(r.getAs[Long]("cms_n") == expected(k),
          s"stream/batch estimate drift at $k: " +
            s"${r.getAs[Long]("cms_n")} vs ${expected(k)}")
      }
      // lifetime token counts behind the snapshots are the true per-source
      // totals (counter exactness, not just estimate equality)
      val trueTok = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      latest.foreach { case ((src, _), r) =>
        assert(r.getAs[Long]("n_tokens") == trueTok(src),
          s"lifetime count drift for $src")
      }
      // per-(source, token) estimates never decrease across snapshots
      snaps.groupBy(r => (r.getAs[String]("source"),
        r.getAs[String]("token"))).values.foreach { rs =>
        val byN = rs.sortBy(_.getAs[Long]("n_tokens"))
        byN.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("cms_n") <= b.getAs[Long]("cms_n"),
              "CMS counters are monotone under inserts")
          case _ =>
        }
      }
    } finally q.stop()
  }
}
