package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compaction reduces file count, preserves rows + partition layout") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact").toString
    // simulate many small append batches: 20 writes of 100 rows each
    (1 to 20).foreach { i =>
      ((i * 100) until (i * 100 + 100)).map(n => (n.toLong, s"v$n", n % 3))
        .toDF("id", "payload", "day")
        .repartition(4) // 4 small files per batch per partition
        .write.mode("append").partitionBy("day").parquet(s"$root/zone")
    }
    val before = countFiles(s"$root/zone")
    val rowsBefore = spark.read.parquet(s"$root/zone").count()

    Compaction.compact(spark, s"$root/zone", s"$root/compacted", "day",
      targetBytesPerFile = 1024 * 1024)

    val after = countFiles(s"$root/compacted")
    val out = spark.read.parquet(s"$root/compacted")
    assert(out.count() == rowsBefore)
    assert(after < before / 10, s"files: $before -> $after")
    val parts = new java.io.File(s"$root/compacted").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("day=0", "day=1", "day=2"))
    // content identical
    val a = spark.read.parquet(s"$root/zone").select("id", "payload", "day")
      .collect().map(_.toString).sorted
    val b = out.select("id", "payload", "day").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("clusteredWrite: files own disjoint sort-key ranges, rows sorted within") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val df = spark.range(10000).select(
      (col("id") * 2654435761L % 10000).as("k"), // scrambled order
      col("id").as("payload"))
    Compaction.clusteredWrite(df, s"$root/out", numFiles = 8, sortCols = Seq("k"))

    val perFile = spark.read.parquet(s"$root/out")
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Long]("lo"))
    assert(perFile.length > 1)
    // disjoint [lo, hi] ranges per file = footer min/max prunes whole files
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping file ranges: $a vs $b")
    }
    assert(perFile.map(_.getAs[Long]("n")).sum == 10000)
  }

  private def countFiles(dir: String): Int = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }
}
