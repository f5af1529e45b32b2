package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The partitioned-checksum algebra q106 exists for: per-partition
  * subtotals (a) FOLD to exactly the q100 whole-table checksum — exact
  * decimal addition is associative across the partition split — and
  * (b) support partial re-verify: one day's subtotal is recomputable
  * from a day-filtered scan alone, so an incremental append re-hashes
  * one partition, not the table. */
class ChecksumFoldSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q106 partition subtotals fold to the q100 orders total") {
    val q100 = graft.SparkEntry.queries("q100_table_checksum")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), BigInt(r.getString(2))))
      .toMap
    val parts = graft.SparkEntry.queries("q106_partition_checksum")(spark, sf)
      .collect()
    assert(parts.length > 1, "expected more than one partition-day")
    val folded = (parts.map(_.getLong(1)).sum,
      parts.map(r => BigInt(r.getString(2))).sum)
    assert(folded == q100("orders"),
      s"partition subtotals $folded do not fold to the table total ${q100("orders")}")
  }

  test("partial re-verify: one day's subtotal recomputes from a day-filtered scan") {
    val parts = graft.SparkEntry.queries("q106_partition_checksum")(spark, sf)
      .collect().map(r => (r.getDate(0), r.getLong(1), BigInt(r.getString(2))))
    val (day, nRows, sum0) = parts.maxBy(_._2) // the busiest day
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val rowStr = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
    val h = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("decimal(38,0)")
    val re = Ops.t(spark, sf, "orders")
      .filter(to_date(col("o_orderdate")) === lit(day))
      .agg(count(lit(1)).as("n"), sum(h).cast("string").as("c")).collect()(0)
    assert(re.getLong(0) == nRows && BigInt(re.getString(1)) == sum0,
      s"day $day re-verify diverged: ${re.mkString(",")} vs ($nRows, $sum0)")
  }
}
