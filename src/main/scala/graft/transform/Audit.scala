package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Audit / data-quality layer — the README-declared-but-unimplemented surface
  * of the reference (`README.md:53`, `:85-87`: invalid records with reasons
  * plus a DQ summary).
  *
  * Design: ONE scan of bronze. `tagRejects` adds a `reject_reason` column in
  * a single projection (no per-rule passes); callers then split with two
  * cheap filters (Catalyst shares the tagged plan) or write valid/invalid in
  * two actions over a cached tag. At 100 TB this matters: rule-per-pass
  * designs re-scan the lake once per rule.
  *
  * Reasons map 1:1 to the generator's fault injector
  * (`src/data_generator/generate_transaction_data.py:111-140`); note
  * `blank_user` has NO matching silver filter in the reference — those rows
  * pass silver silently (SURVEY.md §2.13). We preserve that: blank_user is
  * surfaced by the audit layer only and does NOT reject a row.
  */
object Audit {

  val ReasonBadAmount = "null_or_nonpositive_amount"
  val ReasonBadCurrency = "invalid_currency"
  val ReasonBadStatus = "invalid_status"
  /** Audit-only observation; does not filter (parity with reference). */
  val FlagBlankUser = "blank_user"

  /** First-match reject reason, NULL when the row passes silver validation.
    * Rule order mirrors the silver filter order (amount → currency → status,
    * `etl_transactions_silver.py:126-128`). NULL currency/status must be
    * tagged explicitly: `!isin(...)` evaluates to NULL (not true) for NULL
    * input, while silver's `where(isin(...))` DROPS those rows — without
    * the isNull arms the audit would disagree with the silver filters. */
  def rejectReasonCol: Column =
    when(col("amount").isNull || col("amount") <= 0, ReasonBadAmount)
      .when(col("currency").isNull ||
        !col("currency").isin(Schemas.validCurrencies: _*), ReasonBadCurrency)
      .when(col("status").isNull ||
        !col("status").isin(Schemas.validStatuses: _*), ReasonBadStatus)
      .otherwise(lit(null).cast("string"))

  def tagRejects(bronze: DataFrame): DataFrame = bronze
    .withColumn("reject_reason", rejectReasonCol)
    .withColumn("blank_user_flag",
      col("user_id").isNull || trim(col("user_id")) === "")

  /** Rows silver would drop, with the reason attached. */
  def invalidRecords(tagged: DataFrame): DataFrame =
    tagged.filter(col("reject_reason").isNotNull).drop("blank_user_flag")

  /** Rows silver keeps (reject_reason is null). */
  def validRecords(tagged: DataFrame): DataFrame =
    tagged.filter(col("reject_reason").isNull)
      .drop("reject_reason", "blank_user_flag")

  /** Per-reason counts — the distributable core of the DQ summary.
    * (`groupBy(reject_reason).count` — partial aggregation map-side, tiny
    * shuffle: at most 4 groups regardless of input size.) */
  def countsByReason(tagged: DataFrame): DataFrame = tagged
    .filter(col("reject_reason").isNotNull)
    .groupBy("reject_reason").agg(count(lit(1)).as("n"))

  /** One-row DQ summary (input/valid/invalid/blank_user counts) computed in
    * a single aggregation pass — no collect-per-metric. */
  def dqSummary(tagged: DataFrame): DataFrame = tagged.agg(
    count(lit(1)).as("input_rows"),
    count(when(col("reject_reason").isNull, 1)).as("valid_rows"),
    count(col("reject_reason")).as("invalid_rows"),
    count(when(col("blank_user_flag"), 1)).as("blank_user_rows"),
    count(when(col("reject_reason") === ReasonBadAmount, 1)).as("n_bad_amount"),
    count(when(col("reject_reason") === ReasonBadCurrency, 1)).as("n_bad_currency"),
    count(when(col("reject_reason") === ReasonBadStatus, 1)).as("n_bad_status")
  )

  /** DQ summary as a single JSON line (the README's summary-JSON artifact,
    * `README.md:87`). Runs the one-pass aggregation and renders on the
    * driver — the aggregate is a single row, so this is safe at any scale. */
  def dqSummaryJson(tagged: DataFrame, runDate: String): String = {
    val row = dqSummary(tagged).withColumn("run_date", lit(runDate))
    row.toJSON.collect().head
  }

  /** Zero-extra-scan DQ metrics: attach an [[org.apache.spark.sql.Observation]]
    * to the tagged frame so whatever action runs next (e.g. the silver
    * write) ALSO produces the counts — the 100 TB-friendly alternative to a
    * second aggregation pass over the lake. Read `obs.get` after the
    * action completes. */
  def observed(tagged: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("dq")
    val observed = tagged.observe(obs,
      count(lit(1)).as("input_rows"),
      count(when(col("reject_reason").isNull, 1)).as("valid_rows"),
      count(col("reject_reason")).as("invalid_rows"),
      count(when(col("blank_user_flag"), 1)).as("blank_user_rows"))
    (observed, obs)
  }
}
