package graft.model

import org.apache.spark.sql.types._

/** Explicit schema contracts for the payments medallion pipeline.
  *
  * Mirrors the reference's progressively-hardened schema model: raw CSV is
  * all-string (reference `src/glue_jobs/etl_transactions_bronze.py:24-38`
  * casts from strings), bronze adds typed amount/timestamp/date, silver adds
  * the curated status (`src/glue_jobs/etl_transactions_silver.py:89-112`).
  */
object Schemas {

  /** Raw ingest contract: 8 string columns, CSV with header.
    * Reference: `src/data_generator/generate_transaction_data.py:13`.
    */
  val raw: StructType = StructType(Seq(
    StructField("txn_id", StringType),
    StructField("merchant_id", StringType),
    StructField("user_id", StringType),
    StructField("amount", StringType),
    StructField("currency", StringType),
    StructField("status", StringType),
    StructField("txn_ts", StringType),
    StructField("country", StringType)
  ))

  /** Bronze contract: typed, deduplicated, partitioned by txn_date.
    * Reference: `src/glue_jobs/etl_transactions_bronze.py:24-94`.
    */
  val bronze: StructType = StructType(Seq(
    StructField("txn_id", StringType),
    StructField("merchant_id", StringType),
    StructField("user_id", StringType),
    StructField("amount", DecimalType(12, 2)),
    StructField("currency", StringType),
    StructField("status", StringType),
    StructField("txn_ts", TimestampType),
    StructField("country", StringType),
    StructField("txn_date", DateType)
  ))

  /** Silver contract = bronze + status_curated.
    * Reference: `src/glue_jobs/etl_transactions_silver.py:100-112`.
    */
  val silver: StructType = StructType(bronze.fields :+
    StructField("status_curated", StringType))

  /** Audit contract = silver input schema + reject_reason (README-declared
    * surface; reference `README.md:53`, `:85-87`). */
  val audit: StructType = StructType(bronze.fields :+
    StructField("reject_reason", StringType))

  val validCurrencies: Seq[String] = Seq("USD", "EUR", "GBP", "JPY", "AUD", "CAD")

  val validStatuses: Seq[String] = Seq(
    "AUTHORISED", "SETTLED", "REFUNDED", "CHARGEBACK",
    "DECLINED", "PENDING", "SUCCESS", "FAILED")
}

/** Typed bronze row, offered at the bronze boundary for Dataset[T] use. */
final case class Transaction(
    txn_id: String,
    merchant_id: String,
    user_id: String,
    amount: java.math.BigDecimal,
    currency: String,
    status: String,
    txn_ts: java.sql.Timestamp,
    country: String,
    txn_date: java.sql.Date)
