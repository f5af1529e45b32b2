package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The nanos→micros conversion embedded in q26/q49/q52 claims to be TRUE
  * floor division ("matches epoch_ns//1000 for negative pre-1970 nanos
  * too; `div` alone truncates toward zero") — pin it against
  * Math.floorDiv over the sign/boundary lattice. */
class MicrosFloorDivSpec extends SparkSpec {

  test("ts div 1000 with negative-remainder correction == Math.floorDiv") {
    import spark.implicits._
    val vals = Seq(
      Long.MinValue / 1000 * 1000, // extreme negative, exact multiple
      -123456789L, -1001L, -1000L, -999L, -1L,
      0L, 1L, 999L, 1000L, 1001L, 123456789L,
      Long.MaxValue / 1000 * 1000)
    val got = vals.toDF("ts")
      .withColumn("us",
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) == Math.floorDiv(v, 1000L),
        s"floor-div mismatch for $v: got ${got(v)}, want ${Math.floorDiv(v, 1000L)}")
    }
  }
}
