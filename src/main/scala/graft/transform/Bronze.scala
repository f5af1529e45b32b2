package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Bronze-stage transforms: pure `DataFrame => DataFrame` stages, applied in
  * a documented, deterministic order.
  *
  * Re-expresses the reference's bronze Glue job
  * (`src/glue_jobs/etl_transactions_bronze.py`) with three intentional
  * divergences (SURVEY.md §2.14):
  *  - B1: `normaliseStrings` actually normalises (the reference's
  *    `dataType == "string"` comparison is always false, `:52`);
  *  - B2: stages run in a fixed order (the reference folds a python `set`,
  *    `:113-118`);
  *  - B3: dedup breaks `txn_ts` ties deterministically via a content hash.
  *
  * All casts use `try_*` forms so the pipeline keeps the reference's
  * cast-to-null semantics under Spark 4's default ANSI mode — bad amounts
  * become NULL and are rejected downstream by silver/audit, not exceptions.
  */
object Bronze {

  /** Cast amount → DECIMAL(12,2) and txn_ts → TIMESTAMP.
    * Reference: `etl_transactions_bronze.py:24-38` (cast_dtypes). */
  def castDtypes(df: DataFrame): DataFrame = df
    .withColumn("amount", expr(s"try_cast(amount AS ${DecimalType(12, 2).sql})"))
    .withColumn("txn_ts", try_to_timestamp(col("txn_ts")))

  /** Trim + uppercase every string-typed column.
    * Reference *intent*: `etl_transactions_bronze.py:41-58`
    * (normalise_strings; no-op as written — bug B1, fixed here). */
  def normaliseStrings(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    stringCols.foldLeft(df)((d, c) => d.withColumn(c, upper(trim(col(c)))))
  }

  /** Keep the latest record per txn_id (argmax-per-group via row_number).
    * Reference: `etl_transactions_bronze.py:61-80` (deduplicate_df).
    * Divergence B3: ties on txn_ts break on a stable content hash so golden
    * tests are reproducible regardless of partitioning.
    */
  def deduplicate(df: DataFrame): DataFrame =
    // shared latest-wins primitive so the B3 tiebreak contract (max txn_ts,
    // ties by ASCENDING content hash) is defined exactly once
    graft.operators.Upsert.latestWins(df, Seq("txn_id"), "txn_ts")

  /** Derive the partition column txn_date = to_date(txn_ts).
    * Reference: `etl_transactions_bronze.py:83-94` (derive_txn_date). */
  def deriveTxnDate(df: DataFrame): DataFrame =
    df.withColumn("txn_date", to_date(col("txn_ts")))

  /** Ordered stage list (divergence B2: a Seq, not a set). cast must precede
    * dedup (timestamp ordering) and deriveTxnDate (to_date on timestamp). */
  val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
    "cast_dtypes" -> castDtypes _,
    "normalise_strings" -> normaliseStrings _,
    "deduplicate" -> deduplicate _,
    "derive_txn_date" -> deriveTxnDate _
  )

  /** Full bronze pipeline: raw (all-string) → typed, normalised,
    * deduplicated, date-partitionable. One shuffle (the dedup window). */
  def pipeline(raw: DataFrame): DataFrame =
    stages.foldLeft(raw) { case (d, (_, f)) => d.transform(f) }

  /** Typed view of the bronze boundary: case-class Dataset for callers who
    * want compile-time column safety downstream (SURVEY §1.4). */
  def typed(bronze: DataFrame): org.apache.spark.sql.Dataset[graft.model.Transaction] = {
    val spark = bronze.sparkSession
    import spark.implicits._
    bronze.as[graft.model.Transaction]
  }
}
