package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  private def registered() = { GraftFunctions.register(spark); spark }

  test("graft_dot matches the HOF aggregate fold bit-for-bit") {
    val s = registered()
    import s.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)").as("hof")
    ).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot null array yields null") {
    val s = registered()
    import s.implicits._
    val df = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).collect().head.isNullAt(0))
  }

  test("graft_dot rejects non-double-array inputs at analysis time") {
    val s = registered()
    import s.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] { df.select(expr("graft_dot(a, b)")).collect() }
  }

  test("graft_intersect_card two-pointer merge matches array_intersect size") {
    val s = registered()
    import s.implicits._
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L)),  // overlap 2
      (Array(1L, 2L), Array(3L, 4L)),                   // disjoint
      (Array(7L), Array(7L)),                           // identical
      (Array.empty[Long], Array(1L))                    // empty side
    ).toDF("a", "b")
    val rows = df.select(
      expr("graft_intersect_card(a, b)").as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_intersect_card interpreted eval agrees with codegen") {
    val e = SortedLongIntersectCard(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 5L, 6L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2)
  }
}
