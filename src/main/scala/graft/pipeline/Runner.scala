package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.io.Zones
import graft.transform.{Audit, Bronze, Gold, Silver}

/** Sequential stage orchestration — the Glue-trigger chain
  * (reference `README.md:35-37`, `:77-88`) as pure function composition in
  * one driver. Stages hand off through materialized Parquet, preserving the
  * reference's job-boundary semantics (restartability, zone isolation).
  */
object Runner {

  final case class Result(rawRows: Long, bronzeRows: Long, silverRows: Long,
      invalidRows: Long, dqSummaryJson: String)

  /** raw CSV → bronze → silver (+ audit split + DQ summary) → gold. */
  def run(spark: SparkSession, zones: Zones,
      mode: String = "append", runDate: String = "1970-01-01"): Result = {
    // Bronze job (etl_transactions_bronze.py equivalent)
    val raw = zones.readRaw(spark)
    val bronze = Bronze.pipeline(raw)
    zones.writePartitioned(bronze, zones.bronze, mode)

    // Silver + audit jobs read bronze back from disk (job boundary)
    val bronzeBack = zones.readBronze(spark)
    val silver = Silver.pipeline(bronzeBack)
    zones.writePartitioned(silver, zones.silver, mode)

    // Audit: one extra scan of bronze, tag + split (README-declared layer)
    val tagged = Audit.tagRejects(bronzeBack)
    zones.writePartitioned(Audit.invalidRecords(tagged), zones.auditInvalid, mode)
    val dqJson = Audit.dqSummaryJson(tagged, runDate)
    writeText(spark, s"${zones.auditSummary}/dq_summary_$runDate.json", dqJson)

    // Gold aggregates over silver
    val silverBack = zones.readSilver(spark)
    Gold.merchantDailyKpis(silverBack).write.mode("overwrite")
      .parquet(s"${zones.gold}/merchant_daily_kpis")
    Gold.dailyTotals(silverBack).write.mode("overwrite")
      .parquet(s"${zones.gold}/daily_totals")

    zones.registerTables(spark)
    Result(raw.count(), bronzeBack.count(), silverBack.count(),
      spark.read.parquet(zones.auditInvalid).count(), dqJson)
  }

  /** Writes through the Hadoop FileSystem API so the audit summary lands in
    * the SAME filesystem as the lake zones (hdfs://, s3a://, or local) —
    * java.io would silently write a bogus local path for remote roots. */
  private def writeText(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Local end-to-end demo: generate fixtures, run the lake, print counts. */
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "target/lake"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-runner")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val zones = Zones(root)
    graft.gen.FixtureGen.generate(zones.raw.stripSuffix("/transactions"))
    val res = run(spark, zones, mode = "overwrite", runDate = "2025-08-03")
    println(res)
    spark.sql(
      """SELECT merchant_id, txn_date, sum(amount) AS total, count(*) AS n
        |FROM silver_transactions GROUP BY 1, 2 ORDER BY total DESC LIMIT 5
        |""".stripMargin).show()
    spark.stop()
  }
}
