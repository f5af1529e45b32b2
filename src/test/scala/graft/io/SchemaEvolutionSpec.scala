package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Additive schema evolution, the lake way: newer writers land files with
  * extra columns; readers see the union schema with NULLs for
  * pre-evolution rows (mergeSchema), and the cataloged table follows via
  * LakeCatalog.refreshSchema (the crawler re-run). */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema path read: added column surfaces, old rows read NULL") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(root)
    Seq((3L, "c", 0.9), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.mode("append").parquet(root)

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(merged.count() == 4)
    assert(merged.filter(col("score").isNull).count() == 2, "old rows must read NULL")
    // predicates on the evolved column still push down / evaluate correctly
    assert(merged.filter(col("score") > 0.8).count() == 1)
  }

  test("refreshSchema re-crawls an external table after writer evolution") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-evolve-cat").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(root)
    LakeCatalog.registerExternal(spark, "evolve_t", root)
    assert(spark.table("evolve_t").columns.sorted.toSeq == Seq("id", "v"))

    // a newer writer version lands files with an added column — invisible
    // until the crawl re-runs
    Seq((3L, "c", 0.9)).toDF("id", "v", "score")
      .write.mode("append").parquet(root)
    val merged = LakeCatalog.refreshSchema(spark, "evolve_t")
    assert(merged.fieldNames.sorted.toSeq == Seq("id", "score", "v"))
    val evolved = spark.table("evolve_t")
    assert(evolved.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(evolved.count() == 3)
    assert(evolved.filter(col("score").isNull).count() == 2)
    spark.sql("DROP TABLE evolve_t")
  }

  test("refreshSchema refuses managed tables") {
    import spark.implicits._
    LakeCatalog.saveTable(Seq(1L).toDF("v"), "evolve_managed_t")
    val e = intercept[IllegalArgumentException] {
      LakeCatalog.refreshSchema(spark, "evolve_managed_t")
    }
    assert(e.getMessage.contains("EXTERNAL") || e.getMessage.contains("MANAGED"))
    spark.sql("DROP TABLE evolve_managed_t")
  }
}
