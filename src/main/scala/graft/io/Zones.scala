package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** Medallion-zone IO: raw/bronze/silver/audit roots with the reference's
  * Hive-style partition layout (`ingest_date=` for raw,
  * `etl_transactions_bronze.py:131` / `etl_transactions_silver.py:145` for
  * `txn_date=` in bronze/silver).
  *
  * The reference reads via the Glue Data Catalog
  * (`etl_transactions_bronze.py:123-125`); our equivalent is direct
  * partition-discovering Parquet reads plus optional temp-view registration
  * (the Athena stand-in, SURVEY.md §1.4).
  *
  * Scale notes:
  *  - writes partitionBy(txn_date) so every downstream date predicate
  *    partition-prunes;
  *  - append mode preserved for parity (reference B4); idempotent re-runs
  *    available via dynamic partition overwrite;
  *  - raw CSV reads use the explicit contract schema — no inferSchema pass
  *    over 100 TB.
  */
final case class Zones(root: String) {
  val raw = s"$root/raw/transactions"
  val bronze = s"$root/bronze/transactions_parquet"
  val silver = s"$root/silver/transactions_parquet"
  val auditInvalid = s"$root/audit/invalid_records"
  val auditSummary = s"$root/audit/dq_summary"
  val gold = s"$root/gold"

  /** Raw CSV scan with the explicit 8-string-column contract (S1/S3).
    * `ingest_date` is path metadata (partition-discovered), not part of the
    * logical raw schema — dropped to keep the 8-column contract. */
  def readRaw(spark: SparkSession): DataFrame =
    spark.read.schema(Schemas.raw).option("header", "true").csv(raw)
      .drop("ingest_date")

  /** Crawler-style schema-DISCOVERY raw read (SURVEY §2.1 S3; the Glue
    * Crawler / notebook `inferSchema=True` path, reference `README.md:80`).
    * The explicit-contract `readRaw` stays the scale default — inference
    * costs an extra full pass over the CSV, which is a non-starter at
    * 100 TB — but new/unknown feeds need the discovery option. */
  def readRawInferred(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(raw)
      .drop("ingest_date")

  def readBronze(spark: SparkSession): DataFrame = spark.read.parquet(bronze)
  def readSilver(spark: SparkSession): DataFrame = spark.read.parquet(silver)

  /** Partitioned Parquet write (K1/K2); append for reference parity. */
  def writePartitioned(df: DataFrame, path: String,
      mode: String = "append", overwriteDynamic: Boolean = false): Unit = {
    val w = df.write.mode(mode)
      .option("compression", "snappy")
      .partitionBy("txn_date")
    (if (overwriteDynamic)
       w.option("partitionOverwriteMode", "dynamic")
     else w).parquet(path)
  }

  /** Register bronze/silver in the session catalog — the Athena/Glue
    * stand-in. On a Hive-backed session (`LakeCatalog.session`) these become
    * persistent EXTERNAL tables with crawled partitions that survive JVM
    * restarts; on the default in-memory catalog they are session temp views.
    * Either way `spark.table("bronze_transactions")` resolves. */
  def registerTables(spark: SparkSession): Unit =
    if (LakeCatalog.isHive(spark)) {
      LakeCatalog.registerExternal(spark, "bronze_transactions", bronze)
      LakeCatalog.registerExternal(spark, "silver_transactions", silver)
    } else {
      readBronze(spark).createOrReplaceTempView("bronze_transactions")
      readSilver(spark).createOrReplaceTempView("silver_transactions")
    }

  /** Catalog bronze only (silver may not exist yet mid-pipeline). */
  def registerBronze(spark: SparkSession): Unit =
    if (LakeCatalog.isHive(spark))
      LakeCatalog.registerExternal(spark, "bronze_transactions", bronze)
    else readBronze(spark).createOrReplaceTempView("bronze_transactions")
}

/** Helpers for the driver-provided star-schema testdata (TESTDATA.md). */
object TestTables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // ts normalization: same nanos-LONG contract as the catalog scans
    // (see Ops.normalizeEventTs — driver testdata rounds differ in the
    // parquet timestamp encoding of events.ts)
    graft.analytics.Ops.normalizeEventTs(
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
}
