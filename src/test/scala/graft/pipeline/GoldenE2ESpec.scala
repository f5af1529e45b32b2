package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.io.Zones

/** Golden end-to-end: seed-42 corpus → full lake run → pinned counts.
  * Pins the whole pipeline's behavior (generator, bronze dedup, silver
  * filters, audit split) so any semantic drift fails loudly. */
class GoldenE2ESpec extends SparkSpec {

  test("seed-42 golden run: counts, partition layout, idempotent re-run") {
    val root = Files.createTempDirectory("graft-golden").toString
    val zones = Zones(root)
    graft.gen.FixtureGen.generate(s"$root/raw")
    val res = Runner.run(spark, zones, mode = "overwrite", runDate = "2025-08-03")

    assert(res.rawRows == 3000)
    assert(res.bronzeRows == 3000) // UUID txn_ids: no dups in generator
    assert(res.silverRows == 2948)
    assert(res.invalidRows == 52)
    assert(res.dqSummaryJson.contains("\"valid_rows\":2948"))
    assert(res.dqSummaryJson.contains("\"blank_user_rows\":15"))

    // Hive partition layout on txn_date
    val parts = new java.io.File(zones.silver).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("txn_date=2025-08-01", "txn_date=2025-08-02", "txn_date=2025-08-03"))

    // overwrite re-run is idempotent
    val res2 = Runner.run(spark, zones, mode = "overwrite", runDate = "2025-08-03")
    assert(res2.silverRows == res.silverRows)

    // append re-run duplicates (reference B4 parity): bronze doubles to
    // 6000, silver gains a fresh validation of all 6000 on top of 2948
    val res3 = Runner.run(spark, zones, mode = "append", runDate = "2025-08-03")
    assert(res3.bronzeRows == 2 * res.bronzeRows)
    assert(res3.silverRows == 3 * res.silverRows)
  }
}
