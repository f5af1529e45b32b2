package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** MERGE-style upsert without a transactional table format — the concrete
  * form of SCALE.md's "dedup-on-read by key is the upgrade path where Delta
  * would slot in". Latest-wins by (key, version ordering):
  *
  *  - [[merged]] is the pure resolve: base ∪ updates → one row per key,
  *    keeping the max (orderCol, tiebreak) row. Same deterministic-tiebreak
  *    contract as bronze dedup (B3): ties on orderCol resolve by the
  *    content hash, so re-runs pick the same winner.
  *  - [[writeMerged]] materializes with dynamic-partition overwrite, so
  *    only partitions TOUCHED by updates rewrite — the Parquet equivalent
  *    of MERGE's partition-pruned write.
  *
  * Scale: one shuffle on the key (window rank), and the write rewrites
  * only affected partitions. The read side needs no dedup because the
  * merge materializes resolved rows.
  */
object Upsert {

  /** One row per key: the max (orderCol, xxhash64(all)) row wins. */
  def merged(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      orderCol: String): DataFrame = {
    val all = base.unionByName(updates)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc,
        xxhash64(all.columns.map(col).toIndexedSeq: _*).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge and rewrite ONLY the partitions the updates touch. */
  def writeMerged(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      orderCol: String, partCol: String, dest: String): Unit =
    merged(base, updates, keyCols, orderCol)
      // restrict the write to touched partitions: everything else on disk
      // is untouched by dynamic overwrite anyway, so don't re-shuffle it
      .join(updates.select(col(partCol)).distinct(), Seq(partCol), "left_semi")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(partCol)
      .parquet(dest)
}
