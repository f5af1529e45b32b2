package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer aggregates — the README-declared upgrade surface
  * ("merchant KPIs, daily totals", reference `README.md:130`).
  *
  * All built-in hash aggregates: partial (map-side) + final automatically,
  * one shuffle keyed on the group-by columns. At 100 TB the input is
  * date-partitioned silver, so daily jobs prune to one partition and the
  * shuffle is bounded by merchant cardinality, not data volume.
  */
object Gold {

  /** Per-merchant / per-day KPIs: txn count, gross amount, average ticket,
    * distinct users, success rate over curated status. */
  def merchantDailyKpis(silver: DataFrame): DataFrame = silver
    .groupBy("merchant_id", "txn_date")
    .agg(
      count(lit(1)).as("txn_count"),
      sum("amount").as("gross_amount"),
      avg("amount").as("avg_amount"),
      countDistinct("user_id").as("distinct_users"),
      sum(when(col("status_curated") === "SUCCESS", col("amount"))
        .otherwise(lit(0))).as("success_amount"),
      avg(when(col("status_curated") === "SUCCESS", 1.0).otherwise(0.0))
        .as("success_rate")
    )

  /** Daily totals across all merchants, by currency. */
  def dailyTotals(silver: DataFrame): DataFrame = silver
    .groupBy("txn_date", "currency")
    .agg(
      count(lit(1)).as("txn_count"),
      sum("amount").as("total_amount"),
      countDistinct("merchant_id").as("active_merchants")
    )

  /** Status-mix breakdown per day (curated status distribution). */
  def statusMix(silver: DataFrame): DataFrame = silver
    .groupBy("txn_date")
    .pivot("status_curated",
      Seq("PENDING", "SUCCESS", "REFUNDED", "FAILED", "UNKNOWN"))
    .agg(count(lit(1)))
}
