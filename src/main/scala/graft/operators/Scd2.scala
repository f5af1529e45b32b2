package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension versioning — the other classic lakehouse merge
  * next to [[Upsert]]'s latest-wins: instead of overwriting a key's row,
  * every attribute change CLOSES the current version (`eff_to` = the new
  * version's `eff_from`) and appends a new open one, so joins can ask
  * "what did this merchant look like when the txn happened?"
  *
  * Semantics are TIMELINE REBUILD, not incremental patching: the key's
  * existing version rows (their `eff_from` + attributes) union the change
  * batch, sort by effective-from, collapse consecutive identical attribute
  * states, and re-derive `eff_to`/`is_current` from `lead`. That single
  * definition buys:
  *  - late-arriving changes splice INTO history (a t=3 change arriving
  *    after t=5 closes at 5, not at infinity) — incremental close-out
  *    logic gets this wrong;
  *  - idempotency: re-applying an already-applied batch is a no-op
  *    (its states collapse as consecutive duplicates);
  *  - same-instant conflicts resolve deterministically (ascending
  *    attribute hash — the B3/Upsert tiebreak contract).
  *
  * Scale: every window partitions by the dimension key — fully parallel,
  * shuffle keyed on the key. Per-key state is the VERSION COUNT, not the
  * fact volume; dimensions are the small side of a lake. Combine with
  * [[Upsert.writeMerged]]'s staging + dynamic-partition pattern to
  * materialize (partition dimensions by a stable hash bucket, not
  * eff_from, so versions of a key co-locate).
  */
object Scd2 {

  val EffTo = "eff_to"
  val IsCurrent = "is_current"

  /** Rebuild the versioned dimension from existing version rows (eff_to /
    * is_current ignored if present — they are DERIVED) plus a change
    * batch carrying the same key + attribute + `fromCol` columns. Returns
    * the full new version table: one row per (key, distinct consecutive
    * attribute state), `eff_to` = next version's start (null = open),
    * `is_current` = open flag. */
  def rebuild(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      fromCol: String): DataFrame = {
    val tl = base.drop(EffTo, IsCurrent).unionByName(changes.drop(EffTo, IsCurrent))
    require(tl.columns.contains(fromCol), s"missing $fromCol")
    val attrCols = tl.columns.filterNot(c => keyCols.contains(c) || c == fromCol)
    require(attrCols.nonEmpty, "no attribute columns to version")
    val attrHash = xxhash64(attrCols.map(col).toIndexedSeq: _*)

    // same-instant conflict: one winner per (key, from), ascending hash
    val wSame = Window.partitionBy((keyCols :+ fromCol).map(col): _*)
      .orderBy(attrHash.asc)
    val resolved = tl.withColumn("__rn", row_number().over(wSame))
      .filter(col("__rn") === 1).drop("__rn")

    // collapse consecutive identical states along each key's timeline
    val wKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col(fromCol).asc)
    val collapsed = resolved.withColumn("__h", attrHash)
      .withColumn("__prev", lag(col("__h"), 1).over(wKey))
      .filter(col("__prev").isNull || col("__prev") =!= col("__h"))
      .drop("__h", "__prev")

    // re-derive validity from the collapsed timeline
    collapsed
      .withColumn(EffTo, lead(col(fromCol), 1).over(wKey))
      .withColumn(IsCurrent, col(EffTo).isNull)
  }

  /** Current-state view: exactly [[Upsert.latestWins]]'s contract derived
    * from the version table — one open row per key. */
  def current(versions: DataFrame): DataFrame =
    versions.filter(col(IsCurrent)).drop(EffTo, IsCurrent)

  /** Point-in-time view: the version of each key effective at `at`
    * (eff_from <= at < eff_to). Keys that did not exist yet are absent. */
  def asOf(versions: DataFrame, fromCol: String, at: Any): DataFrame =
    versions.filter(col(fromCol) <= lit(at) &&
      (col(EffTo).isNull || col(EffTo) > lit(at)))
      .drop(EffTo, IsCurrent)
}
