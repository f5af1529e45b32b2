package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot-key workloads.
  *
  * AQE's skew-join splitting (on by default) handles most join skew at
  * runtime; these utilities cover the cases AQE can't: a single pathological
  * key inside an aggregation, and joins where the planner can't see the
  * skew (e.g. freshly shuffled intermediate data with no stats).
  *
  * Salts come from a SEEDED rand(): Spark seeds the generator per
  * (seed, partition), so speculative/retried tasks replay identical salts
  * (unlike unseeded rand()), while byte-identical duplicate rows of a hot
  * key still spread across salts — a content-hash salt would collapse all
  * duplicates of one row onto a single reducer, exactly the straggler this
  * operator exists to prevent.
  */
object SkewOps {

  private val SaltSeed = 0x5eedL

  /** Two-phase (salted) aggregation: spread one hot group over `numSalts`
    * partial groups, then merge. Shuffle 1 is keyed (key, salt) — bounded
    * partition size; shuffle 2 moves `numSalts` rows per key.
    *
    * Measured caveat (BASELINE.md §skew): for ALGEBRAIC aggregates like sum,
    * map-side combine already reduces a hot key to one row per mapper — the
    * unsalted plan won 0.64 s vs 1.66 s at 32M rows/80% hot. Salting pays
    * off when the partial state is LARGE (collect_list/set-like) or the
    * combine is ineffective; measure before reaching for this.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      numSalts: Int = 16): DataFrame = {
    val salt = floor(rand(SaltSeed) * numSalts).cast("long")
    df.withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe COUNT(DISTINCT v) BY key. Plain countDistinct plans as two
    * aggregations where the second shuffles every distinct (key, value)
    * pair of a key to ONE reducer — a hot key with 10M distinct values is
    * a 10M-row straggler no combiner can shrink. Salting here is by VALUE
    * HASH (not random): the same value always lands in the same salt
    * bucket, so per-bucket distinct counts are disjoint and therefore
    * ADDITIVE — `sum` of partials is exact, not approximate. Shuffle 1 is
    * keyed (key, salt): the hot key spreads over `numSalts` reducers;
    * shuffle 2 moves `numSalts` rows per key.
    *
    * Measured caveat (BASELINE.md §skew): locally the unsalted two-stage
    * distinct plan won (4.63 s vs 5.76 s at 32M rows/80% hot) — its heavy
    * (key,value) shuffle is already well spread, and the hot final reducer
    * only counts pre-deduped rows. This operator is insurance for cluster
    * scale, where that one reducer's shuffle-READ bandwidth (not CPU)
    * becomes the wall. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      numSalts: Int = 16): DataFrame = {
    val salt = pmod(hash(col(valueCol)), lit(numSalts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"distinct_$valueCol"))
  }

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * seeded-random salt in [0, numSalts) (see class note on why random, not
    * content-derived); the (small-ish) right side is replicated once per
    * salt. The join key becomes (key, salt) so one hot
    * key spreads over `numSalts` reducers. Right-side cost: ×numSalts rows
    * — use when the right side is too big to broadcast but small enough to
    * replicate, and AQE's split isn't kicking in. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, numSalts: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt",
      floor(rand(SaltSeed) * numSalts).cast("long"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    // SHUFFLE_HASH on the replicated side (guide §3.1): the salted join
    // still shuffles both sides by (key, salt) — the operator's whole
    // point — but each reducer builds a hash table over its
    // replicated-side partition instead of sorting BOTH sides.
    // PRECONDITION (ADVICE r14): the salt only spreads the skewed LEFT
    // side; every salt's partition still holds ALL right rows of a hot
    // key, and ShuffledHashJoin build sides do not spill — so the
    // "small-ish right" contract above really means per-key right
    // cardinality stays bounded (dimension-like). A right side with its
    // own hot keys should keep sort-merge (drop the hint), which spills.
    // The hint also overrides broadcast when the planner would pick it
    // (at bench SFs the replicated side can sit under the threshold):
    // deliberate — broadcasting a ×numSalts-replicated frame pays the
    // replication numSalts× per executor, and at the operator's target
    // scale the replicated side exceeds broadcast anyway. SkewOpsSpec
    // pins the plan in the no-broadcast regime: hinted ⇒ ShuffledHashJoin
    // where the unhinted identical join plans SortMergeJoin.
    salted.join(replicated.hint("shuffle_hash"),
        salted("__salt") === replicated("__salt") &&
          salted(leftKey) === replicated(rightKey))
      .drop("__salt")
  }
}
