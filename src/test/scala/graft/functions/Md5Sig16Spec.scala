package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Md5Sig16]] — the compiled 16-slot md5 MinHash bank must be
  * BIT-IDENTICAL to the expression-chain form it replaced (and therefore
  * to the unchanged DuckDB oracle twin `md5SigSql`):
  * slot j == CAST(CONV(SUBSTRING(MD5(gram || ':' || j), 1, 15), 16, 10)
  * AS BIGINT). */
class Md5Sig16Spec extends SparkSpec {

  test("graft_md5_sig16 == the 16-chain md5/substring/conv form (incl. unicode)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val fixture = graft.analytics.Ops
      .t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text").as("gram")).limit(40)
    val edge = Seq("", "a", "exactly fifteen", "café naïve 世界 😀",
      "trailing colon:", ":3", "a b c " * 30).toDF("gram")
    val grams = fixture.unionByName(edge)
    val chain = (0 until 16).map { j =>
      conv(substring(md5(concat(col("gram"), lit(s":$j"))), 1, 15),
        16, 10).cast("long").as(s"c$j")
    }
    val rows = grams
      .select((col("gram") +: chain) :+
        expr("graft_md5_sig16(gram)").as("hs"): _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getSeq[Long](17)
      assert(hs.length == 16)
      (0 until 16).foreach { j =>
        assert(hs(j) == r.getLong(1 + j),
          s"slot $j diverged for gram '${r.getString(0).take(40)}': " +
            s"compiled=${hs(j)} chain=${r.getLong(1 + j)}")
      }
    }
  }
}
