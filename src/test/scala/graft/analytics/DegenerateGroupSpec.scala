package graft.analytics

import java.nio.file.Files

import graft.SparkSpec

/** Statistical queries over degenerate groups: a 1-row group (sample
  * variance undefined) and a constant-valued group (zero variance, Pearson
  * r undefined) must yield NULL, not an ANSI divide-by-zero abort. */
class DegenerateGroupSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degenerate").toString
    Seq(
      // group A: single row → var undefined
      ("A", 5.0, 100.0),
      // group B: constant quantity (zero variance) → corr undefined
      ("B", 7.0, 10.0), ("B", 7.0, 20.0), ("B", 7.0, 30.0),
      // group C: healthy
      ("C", 1.0, 10.0), ("C", 2.0, 20.0), ("C", 3.0, 30.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate",
        org.apache.spark.sql.functions.lit("1995-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q22 stats: 1-row group yields NULL variance, others defined") {
    val out = graft.SparkEntry.queries("q22_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r.isNullAt(r.fieldIndex("var_qty"))).toMap
    assert(out("A"), "1-row group must have NULL var_qty")
    assert(!out("B") && !out("C"))
  }

  test("q53 corr: zero-variance and 1-row groups yield NULL, healthy group ±1-bounded") {
    val rows = graft.SparkEntry.queries("q53_corr")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows("A").isEmpty && rows("B").isEmpty)
    assert(rows("C").exists(v => math.abs(v) <= 1.0 + 1e-9))
  }
}
