package graft.pipeline

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** The Glue-Data-Catalog property the reference relies on: table metadata
  * OUTLIVES the job that wrote it (`etl_transactions_silver.py:137-139`
  * resolves bronze purely by catalog name, in a different job run than the
  * one that registered it). We prove the equivalent by round-tripping
  * through TWO separate JVMs sharing only the on-disk warehouse +
  * Derby metastore: JVM A `saveAsTable`s a partitioned table; JVM B (fresh
  * process, fresh SparkSession) must resolve it — rows AND partition
  * metadata — from disk alone.
  */
class CatalogPersistenceSpec extends AnyFunSuite {

  /** Fork a JVM running CatalogRoundTrip with this JVM's classpath and the
    * build.sbt --add-opens set (required for Spark 4 on JDK 17). */
  private def fork(mode: String, root: String): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.contains("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.io.CatalogRoundTrip", mode, root)
    val out = new StringBuilder
    val rc = Process(cmd, new java.io.File(root))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    (rc, out.toString)
  }

  test("catalog tables survive a brand-new JVM against the same warehouse") {
    val root = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val (rcW, outW) = fork("write", root)
    assert(rcW == 0, s"write JVM failed:\n$outW")
    assert(outW.contains("CATALOG_WRITE_OK 3"), outW)

    val (rcR, outR) = fork("read", root)
    assert(rcR == 0, s"read JVM failed:\n$outR")
    // 3 rows, 2 dt= partitions — resolved by name from the metastore alone.
    assert(outR.contains("CATALOG_READ_OK 3 2"), outR)
  }

  test("bucket metadata survives the metastore: zero-shuffle join in a fresh JVM") {
    val root = java.nio.file.Files.createTempDirectory("graft-catalog-bk").toString
    val (rcW, outW) = fork("write-bucketed", root)
    assert(rcW == 0, s"bucketed write JVM failed:\n$outW")
    assert(outW.contains("CATALOG_BUCKETED_WRITE_OK"), outW)

    val (rcR, outR) = fork("read-bucketed", root)
    assert(rcR == 0, s"bucketed read JVM failed:\n$outR")
    // 10000 joined rows, 0 hash-partition exchanges: the co-located layout
    // written by one job is picked up by the next purely from the catalog.
    assert(outR.contains("CATALOG_BUCKETED_READ_OK 10000 0"), outR)
  }
}
