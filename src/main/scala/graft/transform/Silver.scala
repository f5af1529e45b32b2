package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Silver-stage transforms: validation filters + status curation.
  *
  * Re-expresses the reference's silver Glue job
  * (`src/glue_jobs/etl_transactions_silver.py`). All four stages are narrow
  * (no shuffle — SURVEY.md §3.2): Catalyst collapses the three filters and
  * pushes them into the bronze Parquet scan as row-group/page filters.
  */
object Silver {

  /** amount > 0 AND amount IS NOT NULL.
    * Reference: `etl_transactions_silver.py:24-38` (validate_amount). */
  def validateAmount(df: DataFrame): DataFrame =
    df.where(col("amount") > 0 && col("amount").isNotNull)

  /** currency ∈ {USD, EUR, GBP, JPY, AUD, CAD}.
    * Reference: `etl_transactions_silver.py:41-57` (validate_currency_types). */
  def validateCurrency(df: DataFrame): DataFrame =
    df.where(col("currency").isin(Schemas.validCurrencies: _*))

  /** status ∈ the 8 known statuses.
    * Reference: `etl_transactions_silver.py:60-86` (validate_txn_statuses). */
  def validateStatus(df: DataFrame): DataFrame =
    df.where(col("status").isin(Schemas.validStatuses: _*))

  /** The curated-status CASE expression, exposed as a Column so the audit
    * layer can reuse it. Reference mapping:
    * `etl_transactions_silver.py:100-110`. */
  def statusCuratedCol(status: Column): Column =
    when(status.isin("AUTHORISED", "PENDING"), "PENDING")
      .when(status.isin("SETTLED", "SUCCESS"), "SUCCESS")
      .when(status === "REFUNDED", "REFUNDED")
      .when(status.isin("CHARGEBACK", "DECLINED", "FAILED"), "FAILED")
      .otherwise("UNKNOWN")

  /** Add status_curated ∈ {PENDING, SUCCESS, REFUNDED, FAILED, UNKNOWN}.
    * Reference: `etl_transactions_silver.py:89-112` (curate_status). */
  def curateStatus(df: DataFrame): DataFrame =
    df.withColumn("status_curated", statusCuratedCol(col("status")))

  /** Ordered validation pipeline (reference `validate_bronze_df`,
    * `etl_transactions_silver.py:115-130`). */
  val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
    "validate_amount" -> validateAmount _,
    "validate_currency" -> validateCurrency _,
    "validate_status" -> validateStatus _,
    "curate_status" -> curateStatus _
  )

  def pipeline(bronze: DataFrame): DataFrame =
    stages.foldLeft(bronze) { case (d, (_, f)) => d.transform(f) }
}
