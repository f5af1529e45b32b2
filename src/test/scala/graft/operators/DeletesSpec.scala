package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeletesSpec extends SparkSpec {

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_purge_spec")
    dir.toFile.deleteOnExit()
    s"$dir/lake"
  }

  private def writeLake(root: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p1"),
      (4L, "d", "p2"), (5L, "e", "p2"),
      (6L, "f", "p3"))
      .toDF("k", "v", "part")
      .write.partitionBy("part").parquet(root)
  }

  private def files(root: String, part: String): Map[String, Long] = {
    val dir = new java.io.File(s"$root/part=$part")
    if (!dir.exists()) Map.empty
    else dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("purges exactly the keyed rows, returns the count, leaves untouched partitions' files alone") {
    import spark.implicits._
    val root = freshLake()
    writeLake(root)
    val p3Before = files(root, "p3")
    val purged = Deletes.purgeKeys(spark.read.parquet(root),
      Seq(1L, 3L).toDF("k"), Seq("k"), "part", root)
    assert(purged === 2L)
    val left = spark.read.parquet(root).select("k").collect().map(_.getLong(0)).sorted
    assert(left.toSeq === Seq(2L, 4L, 5L, 6L))
    // p3 held no doomed key: its files must be byte-identical (not rewritten)
    assert(files(root, "p3") === p3Before)
  }

  test("a fully purged partition disappears from disk") {
    import spark.implicits._
    val root = freshLake()
    writeLake(root)
    val purged = Deletes.purgeKeys(spark.read.parquet(root),
      Seq(4L, 5L).toDF("k"), Seq("k"), "part", root)
    assert(purged === 2L)
    assert(files(root, "p2").isEmpty, "emptied partition dir must be deleted")
    assert(spark.read.parquet(root).count() === 4)
  }

  test("purging absent keys is a no-op returning 0") {
    import spark.implicits._
    val root = freshLake()
    writeLake(root)
    val before = Seq("p1", "p2", "p3").map(p => p -> files(root, p)).toMap
    assert(Deletes.purgeKeys(spark.read.parquet(root),
      Seq(99L).toDF("k"), Seq("k"), "part", root) === 0L)
    assert(Seq("p1", "p2", "p3").map(p => p -> files(root, p)).toMap === before)
  }

  test("replay idempotence: purging already-purged keys removes nothing more") {
    import spark.implicits._
    val root = freshLake()
    writeLake(root)
    assert(Deletes.purgeKeys(spark.read.parquet(root),
      Seq(2L).toDF("k"), Seq("k"), "part", root) === 1L)
    assert(Deletes.purgeKeys(spark.read.parquet(root),
      Seq(2L).toDF("k"), Seq("k"), "part", root) === 0L)
    assert(spark.read.parquet(root).count() === 5)
  }

  test("NULL keys purge null-keyed rows (null-safe match), never silently nothing") {
    import spark.implicits._
    val root = freshLake()
    Seq((Some(1L), "a", "p1"), (None, "n", "p1"), (Some(2L), "b", "p2"))
      .toDF("k", "v", "part")
      .write.partitionBy("part").parquet(root)
    val doomed = Seq(Option.empty[Long]).toDF("k")
    assert(Deletes.purgeKeys(spark.read.parquet(root), doomed,
      Seq("k"), "part", root) === 1L)
    val left = spark.read.parquet(root).select("v").collect().map(_.getString(0)).sorted
    assert(left.toSeq === Seq("a", "b"))
  }

  test("multi-column keys match as tuples") {
    import spark.implicits._
    val root = freshLake()
    Seq((1L, "x", "p1"), (1L, "y", "p1"), (2L, "x", "p2"))
      .toDF("k1", "k2", "part")
      .write.partitionBy("part").parquet(root)
    assert(Deletes.purgeKeys(spark.read.parquet(root),
      Seq((1L, "x")).toDF("k1", "k2"), Seq("k1", "k2"), "part", root) === 1L)
    assert(spark.read.parquet(root).count() === 2)
  }
}
