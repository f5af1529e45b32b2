package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared ledger-read helper for the foreachBatch pipelines that keep
  * standing parquet ledgers ([[StreamingChunkLedger]],
  * [[StreamingWebCurate]]).
  *
  * Reading a ledger with `if (fs.exists(path)) spark.read.parquet(path)`
  * wedges on restart under the at-least-once posture: a crash AFTER the
  * output committer created the directory but BEFORE any part-file
  * committed (or a dir holding only `_temporary`/`_SUCCESS`) leaves a
  * path that exists yet has no data files, and schema INFERENCE throws
  * `Unable to infer schema` on every subsequent batch. Reading with the
  * caller's explicit schema skips inference entirely, so exists-but-
  * fileless degrades to the same empty frame a missing path does — the
  * restart resumes instead of wedging. */
private[streaming] object LedgerIO {

  /** Read `path` as parquet with `schema`; a missing OR fileless path
    * yields an empty frame of that schema. `recursive = true` reads
    * nested per-batch subdirectories too (the `b<batchId>` overwrite
    * layout the idempotent ingests commit under — recursiveFileLookup
    * skips `_`-prefixed files, so commit markers and in-flight
    * `_temporary` trees never surface as data). */
  def readOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      recursive: Boolean = false): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(schema)
        .option("recursiveFileLookup", recursive.toString).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
