package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Upsert contract: latest-wins by key, deterministic on ties, and the
  * partitioned write touches ONLY partitions present in the updates. */
class UpsertSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def df(rows: (String, String, Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "value", "version", "dt")
  }

  test("merged keeps the max-version row per key, inserts new keys") {
    val base = df(("a", "old", 1L, "d1"), ("b", "keep", 5L, "d1"))
    val updates = df(("a", "new", 2L, "d1"), ("c", "ins", 1L, "d2"))
    val out = Upsert.merged(base, updates, Seq("id"), "version")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "new", "b" -> "keep", "c" -> "ins"))
  }

  test("version ties resolve deterministically across re-runs") {
    val base = df(("a", "x", 1L, "d1"))
    val updates = df(("a", "y", 1L, "d1"))
    val winners = (1 to 5).map { _ =>
      Upsert.merged(base, updates, Seq("id"), "version")
        .collect().head.getString(1)
    }
    assert(winners.distinct.size == 1, s"nondeterministic tie: $winners")
  }

  test("latestWins == brute-force argmax for random corpora and any base/update split") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val rows = (1 to 120).map { _ =>
        (s"k${rnd.nextInt(12)}", s"v${rnd.nextInt(1000)}",
          rnd.nextInt(4).toLong, s"d${rnd.nextInt(3)}")
      }
      // brute force: per key, max version; ties by min xxhash64 of all cols
      val all = rows.toDF("id", "value", "version", "dt")
        .withColumn("__h", xxhash64(col("id"), col("value"), col("version"), col("dt")))
      val expected = all.collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) =>
          val best = rs.maxBy(r => (r.getLong(2), -r.getLong(4)))
          (k, best.getString(1), best.getLong(2))
        }.toSet
      val cut = rnd.nextInt(rows.length)
      val (baseRows, updRows) = rows.splitAt(cut)
      val got = Upsert.merged(
          baseRows.toDF("id", "value", "version", "dt"),
          updRows.toDF("id", "value", "version", "dt"), Seq("id"), "version")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected)
    }
  }

  test("a key moving partitions leaves NO stale copy behind") {
    val root = Files.createTempDirectory("graft-upsert-move").toString
    val dest = s"$root/table"
    // 'a' lives alone in d1; 'z' keeps d3 untouched
    df(("a", "old", 1L, "d1"), ("z", "other", 1L, "d3"))
      .write.partitionBy("dt").parquet(dest)

    val base = spark.read.parquet(dest)
    Upsert.writeMerged(base, df(("a", "moved", 5L, "d2")),
      Seq("id"), "version", "dt", dest)

    val after = spark.read.parquet(dest).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("value"),
        r.getAs[String]("dt")))
    // exactly one 'a' row, in its new partition; emptied d1 dir is gone
    assert(after.toSet == Set(("a", "moved", "d2"), ("z", "other", "d3")))
    assert(!new java.io.File(s"$dest/dt=d1").exists(),
      "emptied source partition must be dropped")
    // staging name now carries a unique suffix — assert NO staging sibling
    // survives a successful merge, whatever its suffix
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("table.__graft_merge_staging"))
    assert(leftovers.isEmpty,
      s"staging dir must be removed after a successful merge: ${leftovers.toSeq}")
  }

  test("moved key cleanup handles Hive-ESCAPED partition values (colons)") {
    val root = Files.createTempDirectory("graft-upsert-esc").toString
    val dest = s"$root/table"
    // 'a' alone in an escaped partition (colon → %3A in the dir name)
    df(("a", "old", 1L, "h:01"), ("z", "other", 1L, "h:03"))
      .write.partitionBy("dt").parquet(dest)
    assert(new java.io.File(s"$dest/dt=h%3A01").exists())

    val base = spark.read.parquet(dest)
    Upsert.writeMerged(base, df(("a", "moved", 5L, "h:02")),
      Seq("id"), "version", "dt", dest)

    val after = spark.read.parquet(dest).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("dt"))).toSet
    assert(after == Set(("a", "h:02"), ("z", "h:03")))
    assert(!new java.io.File(s"$dest/dt=h%3A01").exists(),
      "escaped emptied partition dir must be dropped")
  }

  test("moved key cleanup handles TIMESTAMP partition values (no .0 suffix drift)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-upsert-ts").toString
    val dest = s"$root/table"
    def tdf(rows: (String, String, Long, String)*) =
      rows.toDF("id", "value", "version", "tstr")
        .select(col("id"), col("value"), col("version"),
          to_timestamp(col("tstr")).as("pt"))
    // 'a' alone in the 00:00 hour partition (java.sql.Timestamp.toString of
    // this value ends in ".0" — the writer's dir name does not)
    tdf(("a", "old", 1L, "2020-01-01 00:00:00"),
        ("z", "other", 1L, "2020-01-01 02:00:00"))
      .write.partitionBy("pt").parquet(dest)

    val base = spark.read.parquet(dest)
    Upsert.writeMerged(base, tdf(("a", "moved", 5L, "2020-01-01 01:00:00")),
      Seq("id"), "version", "pt", dest)

    val after = spark.read.parquet(dest).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("value")).toMap
    assert(after == Map("a" -> "moved", "z" -> "other"),
      s"stale or missing rows: $after")
    // exactly one 'a' row: the emptied timestamp partition dir is gone
    assert(spark.read.parquet(dest).filter("id = 'a'").count() == 1)
  }

  test("writeMerged rewrites only partitions touched by updates") {
    val root = Files.createTempDirectory("graft-upsert").toString
    val dest = s"$root/table"
    // seed: two partitions
    df(("a", "old", 1L, "d1"), ("z", "stale-part", 1L, "d2"))
      .write.partitionBy("dt").parquet(dest)
    val d2Before = new java.io.File(s"$dest/dt=d2").lastModified()

    Thread.sleep(1100) // ensure mtime granularity can detect a rewrite
    val base = spark.read.parquet(dest)
    Upsert.writeMerged(base, df(("a", "new", 2L, "d1")),
      Seq("id"), "version", "dt", dest)

    val after = spark.read.parquet(dest)
    val byId = after.collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("value")).toMap
    assert(byId == Map("a" -> "new", "z" -> "stale-part"))
    // untouched partition dir was not rewritten
    assert(new java.io.File(s"$dest/dt=d2").lastModified() == d2Before,
      "dt=d2 was rewritten despite no updates touching it")
  }
}
