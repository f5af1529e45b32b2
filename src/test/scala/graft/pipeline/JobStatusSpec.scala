package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** The EventBridge/SNS stand-in contract: a failed stage must leave a
  * FAILED artifact behind (alert path), a successful one a SUCCESS artifact
  * with its metrics, and both must be valid JSON a monitor can ingest. */
class JobStatusSpec extends SparkSpec {

  test("failed stage writes a FAILED artifact before rethrowing") {
    val dir = Files.createTempDirectory("graft-jobstatus").toString
    val reporter = new JobStatus.Reporter(spark, dir, "2025-08-03")
    val boom = intercept[RuntimeException] {
      reporter.stage("silver") { throw new RuntimeException("bad \"input\" row") }
    }
    assert(boom.getMessage.contains("bad"))
    // artifact must exist and be machine-parseable JSON with the failure
    val row = spark.read.json(s"$dir/silver_2025-08-03.json").collect().head
    assert(row.getAs[String]("status") == "FAILED")
    assert(row.getAs[String]("stage") == "silver")
    assert(row.getAs[String]("error").contains("bad \"input\" row"))
    assert(row.getAs[Long]("duration_ms") >= 0L)
  }

  test("successful stage writes SUCCESS with embedded metrics JSON") {
    val dir = Files.createTempDirectory("graft-jobstatus").toString
    val reporter = new JobStatus.Reporter(spark, dir, "2025-08-03")
    val out = reporter.stageWithMetrics("audit") { 42 }(n =>
      Some(s"""{"input_rows":$n,"invalid_rows":0}"""))
    assert(out == 42)
    val row = spark.read.json(s"$dir/audit_2025-08-03.json").collect().head
    assert(row.getAs[String]("status") == "SUCCESS")
    val metrics = row.getAs[org.apache.spark.sql.Row]("metrics")
    assert(metrics.getAs[Long]("input_rows") == 42L)
  }

  test("Runner e2e leaves one SUCCESS artifact per stage") {
    val root = Files.createTempDirectory("graft-lake-status").toString
    val zones = graft.io.Zones(root)
    graft.gen.FixtureGen.generate(zones.raw.stripSuffix("/transactions"))
    Runner.run(spark, zones, mode = "overwrite", runDate = "2025-08-03")
    val stages = Seq("bronze", "silver", "audit", "gold")
    for (s <- stages) {
      val row = spark.read.json(s"$root/jobstatus/${s}_2025-08-03.json").collect().head
      assert(row.getAs[String]("status") == "SUCCESS", s"stage $s not SUCCESS")
    }
  }
}
