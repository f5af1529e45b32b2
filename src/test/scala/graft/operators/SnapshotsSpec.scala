package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_spec")
    dir.toFile.deleteOnExit()
    s"$dir/table"
  }

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("k", "s", "x")
  }

  test("commit assigns sequential versions and reads round-trip exactly") {
    val root = freshRoot()
    assert(Snapshots.latestVersion(spark, root).isEmpty)
    assert(Snapshots.commit(df((1L, "a", 1.0), (2L, "b", 2.0)), root) === 1L)
    assert(Snapshots.commit(df((1L, "a", 9.0)), root) === 2L)
    assert(Snapshots.latestVersion(spark, root) === Some(2L))
    val v1 = Snapshots.read(spark, root, 1).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(v1.toSeq === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(Snapshots.readLatest(spark, root).count() === 1)
  }

  test("rollback is a reversible pointer move; vacuum reclaims abandoned versions") {
    val root = freshRoot()
    Snapshots.commit(df((1L, "a", 1.0)), root)
    Snapshots.commit(df((1L, "a", 2.0)), root)
    Snapshots.rollback(spark, root, 1)
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    assert(Snapshots.readLatest(spark, root)
      .select("x").head().getDouble(0) === 1.0)
    // roll forward again: v2's dir is still there
    Snapshots.rollback(spark, root, 2)
    assert(Snapshots.readLatest(spark, root)
      .select("x").head().getDouble(0) === 2.0)
    // rollback + vacuum actually deletes the newer snapshot
    Snapshots.rollback(spark, root, 1)
    Snapshots.vacuum(spark, root)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, root, 2)
    }
    // a new commit after vacuum re-uses the freed slot
    assert(Snapshots.commit(df((9L, "z", 0.0)), root) === 2L)
  }

  test("uncommitted and out-of-range versions fail loudly") {
    val root = freshRoot()
    intercept[IllegalStateException] { Snapshots.readLatest(spark, root) }
    Snapshots.commit(df((1L, "a", 1.0)), root)
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 0) }
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 2) }
    intercept[IllegalArgumentException] { Snapshots.rollback(spark, root, 2) }
  }

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    import spark.implicits._
    val oldDf = Seq(
      (Some(1L), "keep", 1.0), (Some(2L), "mut", 2.0), (Some(3L), "gone", 3.0),
      (None, "nullkey", 0.0))
      .toDF("k", "s", "x")
    val newDf = Seq(
      (Some(1L), "keep", 1.0), (Some(2L), "mut", 99.0), (Some(4L), "new", 4.0),
      (None, "nullkey", 7.0))
      .toDF("k", "s", "x")
    val d = Snapshots.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(d(1L) === "unchanged")
    assert(d(2L) === "changed")
    assert(d(3L) === "removed")
    assert(d(4L) === "added")
    // NULL-keyed rows match each other (null-safe join) and classify by attrs
    assert(d(-1L) === "changed")
  }

  test("diff ignores columns missing from one side; key-only tables work") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "only_old")
    val b = Seq((1L, 5.0), (3L, 6.0)).toDF("k", "only_new")
    val d = Snapshots.diff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no shared attrs => present-in-both is 'unchanged'
    assert(d === Map(1L -> "unchanged", 2L -> "removed", 3L -> "added"))
  }

  test("crash-shaped commit: an orphaned version dir is invisible and recovered") {
    val root = freshRoot()
    Snapshots.commit(df((1L, "a", 1.0)), root)
    // simulate a crashed commit: data landed for v=2 but pointer never moved
    df((2L, "b", 2.0)).write.parquet(s"$root/v=2")
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 2) }
    // next commit claims slot 2, overwriting the orphan
    assert(Snapshots.commit(df((3L, "c", 3.0)), root) === 2L)
    assert(Snapshots.read(spark, root, 2).select("k").head().getLong(0) === 3L)
  }
}
