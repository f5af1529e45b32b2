package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.io.LakeCatalog

/** registerExternal contract: idempotent re-registration at the same
  * location, and a table name already cataloged at a DIFFERENT location is
  * re-pointed (never silently serves the old path's data). */
class LakeCatalogSpec extends SparkSpec {

  test("re-registering at a new location re-points the table") {
    import spark.implicits._
    val a = Files.createTempDirectory("graft-loc-a").toString
    val b = Files.createTempDirectory("graft-loc-b").toString
    Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(a)
    Seq(10L, 20L).toDF("v").write.mode("overwrite").parquet(b)

    LakeCatalog.registerExternal(spark, "relocate_t", a)
    assert(spark.table("relocate_t").count() == 3)

    // same location again: no-op refresh
    LakeCatalog.registerExternal(spark, "relocate_t", a)
    assert(spark.table("relocate_t").count() == 3)

    // moved lake: stale entry must be dropped and re-created at b
    LakeCatalog.registerExternal(spark, "relocate_t", b)
    assert(spark.table("relocate_t").count() == 2)

    spark.sql("DROP TABLE relocate_t")
  }

  test("registerExternal refuses to drop a MANAGED table on location mismatch") {
    import spark.implicits._
    val other = Files.createTempDirectory("graft-loc-managed").toString
    Seq(9L).toDF("v").write.mode("overwrite").parquet(other)
    LakeCatalog.saveTable(Seq(1L, 2L).toDF("v"), "managed_t")
    try {
      val e = intercept[IllegalArgumentException] {
        LakeCatalog.registerExternal(spark, "managed_t", other)
      }
      assert(e.getMessage.contains("MANAGED"))
      // the managed table and its data must be untouched by the failed call
      assert(spark.table("managed_t").count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS managed_t")
  }

  test("analyze records table and column statistics for the CBO") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stats").toString
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    LakeCatalog.registerExternal(spark, "stats_t", dir)
    LakeCatalog.analyze(spark, "stats_t", Seq("id"))
    val desc = spark.sql("DESCRIBE EXTENDED stats_t")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(desc.contains("100 rows") || desc.contains("rowCount"),
      s"no row-count statistic recorded:\n$desc")
    val colStats = spark.sql("DESCRIBE EXTENDED stats_t id")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").toSeq
    assert(colStats.exists(s => s.startsWith("distinct_count") && !s.endsWith("=NULL")),
      s"no NDV statistic for id: $colStats")
    spark.sql("DROP TABLE stats_t")
  }
}
