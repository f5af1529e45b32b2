package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.gen.FixtureGen

class StreamingBronzeSpec extends SparkSpec {

  test("file-source streaming bronze: backlog processed, deduped, partitioned") {
    val root = Files.createTempDirectory("graft-stream").toString
    FixtureGen.generate(s"$root/raw", FixtureGen.Config(days = 2, rowsPerDay = 500))

    val stream = readBronzeStream(s"$root/raw/transactions")
    val q = StreamingBronze.writeBronze(stream,
      s"$root/bronze", s"$root/checkpoint")
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$root/bronze")
    assert(out.count() == 1000) // UUIDs: no dups in corpus, none dropped
    assert(out.columns.contains("txn_date"))
    val parts = new java.io.File(s"$root/bronze").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("txn_date=")).length
    assert(parts == 2)

    // restart with no new files: checkpoint prevents reprocessing
    val q2 = StreamingBronze.writeBronze(
      readBronzeStream(s"$root/raw/transactions"),
      s"$root/bronze", s"$root/checkpoint")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/bronze").count() == 1000)
  }

  test("streaming dedup drops in-stream duplicate txn_ids") {
    val root = Files.createTempDirectory("graft-stream-dup").toString
    val dir = new java.io.File(s"$root/raw/transactions/ingest_date=2025-08-01")
    dir.mkdirs()
    val rows = Seq(
      FixtureGen.Header,
      "t1,m_0001,u_000001,10.00,GBP,SETTLED,2025-08-01T10:00:00,GB",
      "t1,m_0001,u_000001,10.00,GBP,SETTLED,2025-08-01T10:05:00,GB",
      "t2,m_0001,u_000002,20.00,GBP,SETTLED,2025-08-01T11:00:00,GB")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "x.csv").toPath, rows.mkString("\n"))

    val q = StreamingBronze.writeBronze(
      readBronzeStream(s"$root/raw/transactions"),
      s"$root/bronze", s"$root/checkpoint")
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/bronze").count() == 2)
  }

  test("unparseable-timestamp rows are quarantined, not silently lost") {
    val root = Files.createTempDirectory("graft-stream-nullts").toString
    val dir = new java.io.File(s"$root/raw/transactions/ingest_date=2025-08-01")
    dir.mkdirs()
    val rows = Seq(
      FixtureGen.Header,
      "t1,m_0001,u_000001,10.00,GBP,SETTLED,2025-08-01T10:00:00,GB",
      "t2,m_0001,u_000002,20.00,GBP,SETTLED,not-a-timestamp,GB",
      "t3,m_0001,u_000003,30.00,GBP,SETTLED,2025-08-01T11:00:00,GB")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "x.csv").toPath, rows.mkString("\n"))

    // bronze gets only the two event-timed rows...
    val q = StreamingBronze.writeBronze(
      readBronzeStream(s"$root/raw/transactions"),
      s"$root/bronze", s"$root/checkpoint")
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/bronze").count() == 2)

    // ...and the null-ts row lands in the quarantine stream
    val quarantine = StreamingBronze.nullTsQuarantine(
      StreamingBronze.readRawStream(spark, s"$root/raw/transactions"))
    val q2 = quarantine.writeStream.format("memory").queryName("null_ts_q")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val bad = spark.table("null_ts_q").collect()
    assert(bad.length == 1 && bad.head.getAs[String]("txn_id") == "T2")
  }

  test("windowed daily merchant totals over a stream") {
    val root = Files.createTempDirectory("graft-stream-agg").toString
    FixtureGen.generate(s"$root/raw", FixtureGen.Config(days = 2, rowsPerDay = 200))
    val bronze = StreamingBronze.pipeline(
      StreamingBronze.readRawStream(spark, s"$root/raw/transactions"))
    val q = StreamingBronze.dailyMerchantTotals(bronze)
      .writeStream.format("memory").queryName("daily_totals")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("daily_totals")
    import org.apache.spark.sql.functions.sum
    assert(out.agg(sum("txn_count")).collect().head.getLong(0) == 400)
    assert(out.select("txn_date").distinct().count() == 2)
  }

  private def readBronzeStream(rawDir: String) =
    StreamingBronze.pipeline(StreamingBronze.readRawStream(spark, rawDir))
}
