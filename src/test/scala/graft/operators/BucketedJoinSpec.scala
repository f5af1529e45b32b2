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
