package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.transform.Gold
import Ops._

/** Driver-gated oracle coverage for the ACTUAL gold-layer functions
  * ([[graft.transform.Gold]] — the reference's declared gold aggregates,
  * `README.md:85-87,130`), not a re-expression of them: each query builds a
  * silver-SHAPED projection of the driver `orders` testdata (same columns
  * and types the silver zone carries) and runs the real Gold function over
  * it.
  *
  * Determinism surface: `amount` is cast to DECIMAL(18,4) exactly as the
  * bronze cast does, so the gold sums are exact decimals surfaced as DOUBLE
  * (the QueryDef contract). `avg_amount` (decimal division) is EXCLUDED
  * from the compared surface: Spark rounds decimal division HALF_UP at a
  * fixed result scale while DuckDB's AVG over decimal returns a
  * double-division result, so low bits legitimately differ — it stays
  * covered by Gold's unit specs instead.
  */
object GoldQueries {

  /** Silver-shaped projection of `orders`: the curated-transaction columns
    * Gold consumes (merchant_id, txn_date, amount, user_id, status_curated,
    * currency) derived deterministically so the DuckDB twin can build the
    * identical frame. */
  private def silverShaped(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      (col("o_custkey") % 50).as("merchant_id"),
      to_date(col("o_orderdate")).as("txn_date"),
      col("o_totalprice").cast(DecimalType(18, 4)).as("amount"),
      col("o_custkey").as("user_id"),
      when(col("o_orderstatus") === "F", "SUCCESS")
        .when(col("o_orderstatus") === "O", "PENDING")
        .when(col("o_orderstatus") === "P", "REFUNDED")
        .otherwise("UNKNOWN").as("status_curated"),
      when(col("o_custkey") % 3 === 0, "USD")
        .when(col("o_custkey") % 3 === 1, "EUR")
        .otherwise("GBP").as("currency"))

  private val silverShapedSql = """
    SELECT o_custkey % 50 AS merchant_id,
           CAST(o_orderdate AS DATE) AS txn_date,
           CAST(o_totalprice AS DECIMAL(18,4)) AS amount,
           o_custkey AS user_id,
           CASE o_orderstatus WHEN 'F' THEN 'SUCCESS' WHEN 'O' THEN 'PENDING'
                              WHEN 'P' THEN 'REFUNDED' ELSE 'UNKNOWN' END
             AS status_curated,
           CASE o_custkey % 3 WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END
             AS currency
    FROM orders"""

  val defs: Seq[QueryDef] = Seq(

    // ── Gold.merchantDailyKpis, driver-gated ───────────────────────────
    QueryDef("q63_gold_kpis", (s, d) => {
      Gold.merchantDailyKpis(silverShaped(s, d)).select(
        col("merchant_id"), col("txn_date"), col("txn_count"),
        col("gross_amount").cast("double").as("gross_amount"),
        col("distinct_users"),
        col("success_amount").cast("double").as("success_amount"),
        col("success_rate"))
    }, Some(s"""
      WITH silver AS ($silverShapedSql)
      SELECT merchant_id, txn_date,
             COUNT(*) AS txn_count,
             CAST(SUM(amount) AS DOUBLE) AS gross_amount,
             COUNT(DISTINCT user_id) AS distinct_users,
             CAST(SUM(CASE WHEN status_curated = 'SUCCESS' THEN amount
                           ELSE 0 END) AS DOUBLE) AS success_amount,
             AVG(CAST(CASE WHEN status_curated = 'SUCCESS' THEN 1 ELSE 0 END
                      AS DOUBLE)) AS success_rate
      FROM silver GROUP BY merchant_id, txn_date"""),
      notes = "the ACTUAL Gold.merchantDailyKpis over a silver-shaped orders projection"),

    // ── Gold.dailyTotals, driver-gated ─────────────────────────────────
    QueryDef("q63b_gold_daily", (s, d) => {
      Gold.dailyTotals(silverShaped(s, d)).select(
        col("txn_date"), col("currency"), col("txn_count"),
        col("total_amount").cast("double").as("total_amount"),
        col("active_merchants"))
    }, Some(s"""
      WITH silver AS ($silverShapedSql)
      SELECT txn_date, currency,
             COUNT(*) AS txn_count,
             CAST(SUM(amount) AS DOUBLE) AS total_amount,
             COUNT(DISTINCT merchant_id) AS active_merchants
      FROM silver GROUP BY txn_date, currency"""),
      notes = "the ACTUAL Gold.dailyTotals over a silver-shaped orders projection"),

    // ── Gold.statusMix (pivot), driver-gated ───────────────────────────
    // Spark's pivot-count yields NULL for a (day, status) with no rows
    // where the oracle's CASE-sum yields 0 — the surface coalesces, the
    // pivot itself is Gold's.
    QueryDef("q63c_gold_status_mix", (s, d) => {
      val mix = Gold.statusMix(silverShaped(s, d))
      mix.select(col("txn_date") +:
        Seq("PENDING", "SUCCESS", "REFUNDED", "FAILED", "UNKNOWN")
          .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
    }, Some(s"""
      WITH silver AS ($silverShapedSql)
      SELECT txn_date,
             CAST(SUM(CASE WHEN status_curated = 'PENDING'  THEN 1 ELSE 0 END) AS BIGINT) AS PENDING,
             CAST(SUM(CASE WHEN status_curated = 'SUCCESS'  THEN 1 ELSE 0 END) AS BIGINT) AS SUCCESS,
             CAST(SUM(CASE WHEN status_curated = 'REFUNDED' THEN 1 ELSE 0 END) AS BIGINT) AS REFUNDED,
             CAST(SUM(CASE WHEN status_curated = 'FAILED'   THEN 1 ELSE 0 END) AS BIGINT) AS FAILED,
             CAST(SUM(CASE WHEN status_curated = 'UNKNOWN'  THEN 1 ELSE 0 END) AS BIGINT) AS UNKNOWN
      FROM silver GROUP BY txn_date"""),
      notes = "the ACTUAL Gold.statusMix pivot over a silver-shaped orders projection")
  )
}
