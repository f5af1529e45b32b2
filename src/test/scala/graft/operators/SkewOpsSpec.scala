package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {

  private def skewed() = {
    import spark.implicits._
    // one hot key (90%) + long tail
    (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
  }

  test("saltedSum equals plain groupBy sum") {
    val df = skewed()
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("saltedInnerJoin equals plain inner join") {
    import spark.implicits._
    val left = skewed()
    val right = Seq(("hot", "H"), ("k950", "T")).toDF("rk", "tag")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "v", "tag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted
    val salted = SkewOps.saltedInnerJoin(left, right, "k", "rk")
      .select("k", "v", "tag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedDistinctCount equals plain countDistinct (incl duplicate values)") {
    import spark.implicits._
    // hot key with many distinct values AND repeated ones (dupes must not
    // double-count across salt buckets — value-hash salting keeps every
    // occurrence of a value in one bucket)
    val df = ((1 to 500).map(i => ("hot", i % 200)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("k", "v")
    val plain = df.groupBy("k").agg(count_distinct(col("v")).as("distinct_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedDistinctCount(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("hot") == 200L)
  }

  test("saltedInnerJoin plans ShuffledHashJoin where the unhinted join sort-merges") {
    // r15 (VERDICT r14 #6): the hint's effect asserted as a plan pin in
    // the NO-BROADCAST regime (the operator's target scale — the
    // replicated side exceeds any broadcast threshold at 100 TB; at
    // bench SFs the planner would otherwise pick BroadcastHashJoin,
    // which is what the r14 before-plan actually showed).
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = skewed()
      val right = Seq(("hot", "H"), ("k950", "T")).toDF("rk", "tag")
      val hinted = SkewOps.saltedInnerJoin(left, right, "k", "rk")
        .queryExecution.executedPlan.toString
      assert(hinted.contains("ShuffledHashJoin"),
        s"hint lost — salted join no longer shuffled-hash:\n$hinted")
      assert(!hinted.contains("SortMergeJoin"),
        s"salted join fell back to sort-merge:\n$hinted")
      // the IDENTICAL join without the hint: sort-merge is what the
      // planner picks once broadcast is off the table
      val salted = left.withColumn("__salt",
        floor(rand(0x5eedL) * 16).cast("long"))
      val replicated = right.withColumn("__salt",
        explode(sequence(lit(0L), lit(15L))))
      val unhinted = salted.join(replicated,
          salted("__salt") === replicated("__salt") &&
            salted("k") === replicated("rk"))
        .queryExecution.executedPlan.toString
      assert(unhinted.contains("SortMergeJoin"),
        s"unhinted baseline no longer sort-merges:\n$unhinted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salting spreads BYTE-IDENTICAL duplicate rows of a hot key") {
    import spark.implicits._
    // the case a content-hash salt cannot handle: every row identical
    val dupes = Seq.fill(1000)(("hot", 1.0)).toDF("k", "v").repartition(4)
    val salts = dupes
      .withColumn("__salt", floor(rand(0x5eedL) * 16).cast("long"))
      .select("__salt").distinct().count()
    assert(salts > 4, s"identical rows only spread over $salts salts")
    // and the aggregate stays correct
    val total = SkewOps.saltedSum(dupes, Seq("k"), "v")
      .collect().head.getDouble(1)
    assert(total == 1000.0)
  }
}
