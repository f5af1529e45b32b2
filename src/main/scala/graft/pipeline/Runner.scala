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

  /** raw CSV → bronze → silver (+ audit split + DQ summary) → gold. Every
    * stage reports SUCCESS/FAILED + timing through JobStatus.Reporter (the
    * EventBridge/SNS monitoring equivalent, `README.md:96-104`). */
  def run(spark: SparkSession, zones: Zones,
      mode: String = "append", runDate: String = "1970-01-01"): Result = {
    // One bounded retry per stage (the Glue-trigger at-least-once stand-in):
    // safe because every retried stage body ends at its ONE write — either
    // overwrite-mode, dynamic-partition overwrite (audit invalid), or an
    // append guarded by the output-commit protocol (failed jobs commit
    // nothing). Multi-action bodies are split into separate stages so a
    // late-action failure never replays an earlier committed write.
    val reporter = new JobStatus.Reporter(spark, s"${zones.root}/jobstatus", runDate,
      maxRetries = 1)

    // Bronze job (etl_transactions_bronze.py equivalent)
    reporter.stage("bronze") {
      val raw = zones.readRaw(spark)
      zones.writePartitioned(Bronze.pipeline(raw), zones.bronze, mode)
    }

    // Silver + audit jobs resolve bronze THROUGH THE CATALOG, mirroring the
    // reference's catalog-only reads (etl_transactions_silver.py:137-139) —
    // persistent external table under LakeCatalog.session, temp view under
    // the in-memory catalog. Registration + resolution live INSIDE the
    // silver stage so a catalog failure (stale Derby lock, corrupt zone)
    // still produces a FAILED artifact for the monitor.
    val bronzeBack = reporter.stage("silver") {
      zones.registerBronze(spark)
      val b = spark.table("bronze_transactions")
      zones.writePartitioned(Silver.pipeline(b), zones.silver, mode)
      b
    }

    // Audit: one extra scan of bronze, tag + split (README-declared layer).
    // Two stages, because a retried body must be idempotent end-to-end:
    //  - "audit" writes the invalid split via dynamic-partition OVERWRITE
    //    (recomputed from bronze, so a retry rewrites the same partitions
    //    with the same rows — append here would duplicate the audit zone
    //    and inflate Result.invalidRows on any retry);
    //  - "audit_summary" computes + writes the DQ summary (pure aggregate
    //    plus an overwriting text write — trivially re-runnable). Its DQ
    //    JSON rides along as the stage report's metrics object.
    val tagged = Audit.tagRejects(bronzeBack)
    reporter.stage("audit") {
      zones.writePartitioned(Audit.invalidRecords(tagged), zones.auditInvalid,
        mode = "overwrite", overwriteDynamic = true)
    }
    val dqJson = reporter.stageWithMetrics("audit_summary") {
      val dq = Audit.dqSummaryJson(tagged, runDate)
      writeText(spark, s"${zones.auditSummary}/dq_summary_$runDate.json", dq)
      dq
    }(dq => Some(dq))

    // Gold aggregates over silver (catalog read, inside the stage as above)
    val silverBack = reporter.stage("gold") {
      zones.registerTables(spark)
      val sv = spark.table("silver_transactions")
      Gold.merchantDailyKpis(sv).write.mode("overwrite")
        .parquet(s"${zones.gold}/merchant_daily_kpis")
      Gold.dailyTotals(sv).write.mode("overwrite")
        .parquet(s"${zones.gold}/daily_totals")
      sv
    }
    Result(zones.readRaw(spark).count(), bronzeBack.count(), silverBack.count(),
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
    // Hive-metastore-backed session: the lake's table registrations persist
    // under <root>/metastore_db across runs (Glue Data Catalog stand-in).
    val spark = graft.io.LakeCatalog.session(root)
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
