package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TableProfile: exact stats must match hand counts on a planted frame
  * (nulls, duplicates, mixed types); the approx variant keeps the same
  * schema with near-exact cardinalities; and each column's scan must be
  * pruned to that column alone (the k-single-column-streams claim). */
class TableProfileSpec extends SparkSpec {

  test("exact profile matches hand counts on a planted frame") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, "b"), (3L, null), (null, "a"), (null, null)
    ).toDF("id", "tag")
    val rows = TableProfile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "tag"))
    val id = rows("id")
    assert(id.getLong(1) == 6L, "n_rows")
    assert(id.getLong(2) == 2L, "id nulls")
    assert(id.getLong(3) == 3L, "id distinct (nulls excluded)")
    assert(id.getString(4) == "1" && id.getString(5) == "3", "id min/max")
    val tag = rows("tag")
    assert(tag.getLong(2) == 2L, "tag nulls")
    assert(tag.getLong(3) == 2L, "tag distinct")
    assert(tag.getString(4) == "a" && tag.getString(5) == "b", "tag min/max")
  }

  test("empty and all-null columns profile without error") {
    import spark.implicits._
    val df = Seq[(Integer, Integer)]((null, 1), (null, 2)).toDF("allnull", "x")
    val m = TableProfile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("allnull").getLong(2) == 2L && m("allnull").getLong(3) == 0L)
    assert(m("allnull").getString(4) == null && m("allnull").getString(5) == null)
    val empty = TableProfile.profile(df.filter(lit(false))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(empty("x").getLong(1) == 0L && empty("x").getLong(3) == 0L)
  }

  test("approx variant keeps the schema; cardinality within the rsd band") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, s"v${i % 97}")).toDF("id", "tag")
    val exact = TableProfile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = TableProfile.profileApprox(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, n) =>
      val a = approx(c).toDouble
      assert(math.abs(a - n) <= math.max(1.0, 0.05 * n),
        s"$c: approx $a too far from exact $n")
    }
  }

  test("each column's parquet scan is pruned to that column (ReadSchema)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = TableProfile.profile(docs, Seq("lang")).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReadSchema: struct<lang:string>"),
      s"lang profile must read only the lang column:\n$p")
    assert(!p.contains("text"), s"profile of lang must never read text:\n$p")
  }
}
