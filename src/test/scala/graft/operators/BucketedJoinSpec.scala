package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.io.LakeCatalog

/** Evidence for the bucketing scale path (SCALE.md): two tables bucketed on
  * the join key co-locate — the sort-merge join runs with NO shuffle
  * exchange. At 100 TB this is the difference between re-shuffling two fact
  * tables per query and reading pre-bucketed data. */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed on the key has no shuffle exchange") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bucketed").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      (1 to 10000).map(i => (i.toLong, s"left$i")).toDF("id", "l")
        .write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id")
        .option("path", s"$dir/t_left").saveAsTable("t_left")
      (1 to 10000).map(i => (i.toLong, s"right$i")).toDF("id", "r")
        .write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id")
        .option("path", s"$dir/t_right").saveAsTable("t_right")

      val joined = spark.table("t_left").join(spark.table("t_right"), "id")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$physical")
      assert(joined.count() == 10000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_left")
      spark.sql("DROP TABLE IF EXISTS t_right")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q70's anti-join is exchange-free on the base side against an fp-bucketed base") {
    // Build-enforces the q70 scaladoc claim (DedupQueries): at 100 TB the
    // clean base lives as a fingerprint-bucketed table, and the incremental
    // batch-vs-base anti-join then shuffles ONLY the arriving batch — the
    // base side is read co-located, no Exchange above its scan.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.adaptive.enabled", "false") // inspect the static plan
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("fp", graft.text.TextSignals.normalizedFingerprint(col("text")))
        .withColumn("is_batch",
          substring(md5(col("doc_id").cast("string")), 1, 2) <= "28")
      LakeCatalog.saveTable(docs.filter(!col("is_batch")).select("fp").distinct(),
        "b_base_fp", bucketCols = Seq("fp"), numBuckets = 8)

      val w = Window.partitionBy("fp").orderBy("doc_id")
      val result = docs.filter(col("is_batch"))
        .join(spark.table("b_base_fp"), Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "source", "fp")

      val smj = result.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge anti join in the plan")
      assert(smj.get.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti)
      // base (right) side: bucketed scan, ZERO exchanges above it
      assert(smj.get.right.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.bucketedScan => s }.nonEmpty,
        s"base side does not read the bucketed layout:\n${smj.get.right}")
      assert(smj.get.right.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
        s"base side of the anti-join still shuffles:\n${smj.get.right}")

      // layout changes the plan, not the rows: same output as q70's
      // path-read form on the identical batch/base split
      val expected = graft.SparkEntry.queries("q70_incremental_dedup")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val got = result.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_base_fp")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("LakeCatalog.saveTable bucketing makes lineitem⋈orders shuffle-free") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      LakeCatalog.saveTable(lineitem, "b_lineitem",
        bucketCols = Seq("l_orderkey"), numBuckets = 8, sortCols = Seq("l_orderkey"))
      LakeCatalog.saveTable(orders, "b_orders",
        bucketCols = Seq("o_orderkey"), numBuckets = 8, sortCols = Seq("o_orderkey"))

      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        spark.table("b_lineitem")("l_orderkey") === spark.table("b_orders")("o_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed lineitem⋈orders still shuffles:\n$physical")
      // same result as the path join: the layout changes the plan, not rows
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
