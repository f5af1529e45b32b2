package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness: current q36 MinHash signature stage (explode +
  * 16 seeded min-aggs, one tiny shuffle) vs a zero-shuffle higher-order
  * variant (nested transform/array_min, interpreted lambdas). Prints
  * per-variant seconds; used to decide the production shape. */
object Q36Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val K = 16
    // the PRODUCTION shingle expression — shared (tokenized + split-once
    // form, round 3), so the experiment can never silently drift from what
    // q36 actually computes
    val shingles = DedupQueries.shinglesOfToks
    def docs() = DedupQueries.tokenized(
      spark.read.parquet(s"$sfDir/documents.parquet"))

    def explodeAgg() = {
      val sh = docs().select(col("doc_id"), explode(expr(shingles)).as("sng"))
      val minCols = (0 until K).map(j => min(xxhash64(col("sng"), lit(j))).as(s"h$j"))
      sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }
    def higherOrder() = {
      docs().select(col("doc_id"), expr(shingles).as("sh"))
        .select(col("doc_id"), expr(
          s"transform(sequence(0, ${K - 1}), j -> array_min(transform(sh, g -> xxhash64(g, j))))")
          .as("sig"))
    }
    // warm both, then time 3 reps each
    explodeAgg().write.mode("overwrite").format("noop").save()
    higherOrder().write.mode("overwrite").format("noop").save()
    Seq("explodeAgg" -> (() => explodeAgg()), "higherOrder" -> (() => higherOrder()))
      .foreach { case (name, f) =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%12s min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    // value parity: signatures must be identical
    val a = explodeAgg()
    val bCols = col("doc_id") +:
      (0 until K).map(j => element_at(col("sig"), j + 1).as(s"h$j"))
    val b = higherOrder().select(bCols: _*)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"value diff rows: $diff")
    spark.stop()
  }
}
