package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Interchange formats for document corpora beyond the lake's parquet/CSV:
  * JSONL (the lingua franca LLM text corpora actually arrive in — one JSON
  * object per line, splittable, append-friendly) and ORC (the other
  * columnar format a lake is asked to read; keeps predicate pushdown and
  * column pruning, proven in CorpusIOSpec).
  *
  * Design rules, same as the CSV path (`Zones.readRaw`):
  *  - reads take an EXPLICIT schema — schema inference is an extra full
  *    pass over the data, a non-starter at 100 TB;
  *  - malformed lines are an AUDIT stream, not a crash and not a silent
  *    drop: PERMISSIVE mode + a corrupt-record column, so ingest jobs
  *    split good rows from bad exactly like Silver splits valid/invalid
  *    (reference `etl_transactions_silver.py` validation pattern);
  *  - writes are snappy-compressed and optionally Hive-partitioned, so a
  *    JSONL/ORC corpus drop partition-prunes like any other zone.
  */
object CorpusIO {

  val CorruptCol = "_corrupt_record"

  /** JSONL scan with explicit schema + corrupt-line audit column. The
    * returned frame carries `_corrupt_record` (NULL for clean rows, the
    * raw line for malformed ones); callers split with
    * [[partitionCorrupt]]. Multi-line JSON is deliberately NOT supported:
    * one-object-per-line is what keeps the format splittable at scale. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    // Spark only populates the corrupt column if it is part of the read
    // schema; caching the raw line costs one string per BAD row only.
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** (clean rows — corrupt column dropped, bad rows — full row kept).
    *
    * Spark's PERMISSIVE JSON semantics: a line that fails to PARSE yields
    * the raw line in the corrupt column with all schema fields NULL, but a
    * line that parses while missing fields is a CLEAN row with NULLs —
    * field-level validation stays a Silver-style concern, this split is
    * purely about parseability.
    *
    * The bad side keeps the FULL row, not just the raw line: partition
    * values survive into the audit stream, and Spark refuses plans whose
    * projection is ONLY the corrupt column over a raw JSON scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — narrowing
    * further is the caller's choice after a cache/write. */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(df.col(CorruptCol).isNotNull))

  /** JSONL → columnar staging → (clean, corrupt) in ONE pass over the raw
    * text. This is the production ingest shape: Spark refuses any plan over
    * a raw JSON scan that prunes down to the corrupt column alone (the
    * audit side's count/write does exactly that), and its documented
    * workaround — cache() — is not an answer for a 100 TB drop. Landing
    * the parsed frame to snappy parquet first costs the single full pass
    * the ingest must pay anyway, and every downstream split/audit/retry
    * then reads columnar with pruning + pushdown instead of re-parsing
    * text. The returned frames both read from `stagingPath`. */
  def ingestJsonl(spark: SparkSession, path: String, schema: StructType,
      stagingPath: String): (DataFrame, DataFrame) = {
    readJsonl(spark, path, schema)
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(stagingPath)
    partitionCorrupt(spark.read.parquet(stagingPath))
  }

  /** One-object-per-line snappy JSONL write. Binary columns become base64
    * strings per the JSON spec — lossless but 4/3 the bytes; media-bearing
    * corpora should stay parquet/ORC (see [[writeOrc]]). */
  def writeJsonl(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    var w = df.write.mode(mode).option("compression", "snappy")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.json(path)
  }

  /** ORC scan; explicit schema optional (ORC is self-describing and reads
    * its schema from the footer like parquet — no data pass). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Snappy ORC write — full-fidelity for every lake type including binary
    * (multimodal payload columns round-trip exactly, CorpusIOSpec). */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    var w = df.write.mode(mode).option("compression", "snappy")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.orc(path)
  }
}
