package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, ZOrder2}

class ZOrderSpec extends SparkSpec {

  /** Bit-by-bit reference interleave, independent of the magic-mask impl. */
  private def refInterleave(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val cases = Seq(
    (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
    (12345L, 54321L), (0xFFFFFFFFL, 0xFFFFFFFFL),
    (0x12345678L, 0x9ABCDEF0L & 0xFFFFFFFFL), (32767L, 32768L))

  test("interleave algebra matches the bit-by-bit reference (Scala + codegen)") {
    import spark.implicits._
    cases.foreach { case (a, b) =>
      assert(ZOrder2.interleave(a, b) == refInterleave(a, b),
        s"interleave($a, $b) drifted")
    }
    // and through the SQL function / codegen path
    GraftFunctions.register(spark)
    val got = cases.toDF("a", "b")
      .select($"a", $"b", call_function("graft_zorder", $"a", $"b").as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == refInterleave(a, b), s"codegen z($a, $b) drifted")
    }
  }

  test("zkey saturate-clamps out-of-range dims: no wraparound, rank order kept") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (-100L, 7L),        // negative -> clamps to 0
      (0L, 7L),
      (100L, 7L),
      (65535L, 7L),
      (65536L, 7L),       // over-range -> clamps to 65535, NOT to 0
      (1L << 40, 7L))     // far over-range -> still 65535
      .toDF("a", "b")
      .select($"a", ZOrderLayout.zkey($"a", $"b").as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(-100L) == rows(0L), "negative input must clamp to 0")
    assert(rows(65536L) == rows(65535L), "over-range must saturate, not wrap")
    assert(rows(1L << 40) == rows(65535L))
    // in-range rank order is monotone for a fixed second dim
    assert(rows(0L) < rows(100L) && rows(100L) < rows(65535L))
  }

  test("z-layout bounds BOTH dims per file; a 1-D sort layout only its own") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid — every (x, y) cell once
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")

    ZOrderLayout.write(grid, col("x"), col("y"), s"$root/z", numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$root/xsort")

    // per-file footer boxes — the information min/max skipping acts on
    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // files a min/max-pruning reader must open for a range predicate
    def hitX(bs: Array[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      bs.count { case (xlo, xhi, _, _) => xhi >= lo && xlo <= hi }
    def hitY(bs: Array[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      bs.count { case (_, _, ylo, yhi) => yhi >= lo && ylo <= hi }

    val zb = boxes(s"$root/z")
    val xb = boxes(s"$root/xsort")
    assert(zb.length == 16 && xb.length == 16,
      s"expected 16 files per layout, got z=${zb.length} x=${xb.length}")

    // x-selective query: the 1-D layout is optimal, z pays the shared-bits
    // tax but still prunes
    assert(hitX(xb, 8, 15) <= 6, s"x-sort lost x pruning: ${hitX(xb, 8, 15)}/16")
    assert(hitX(zb, 8, 15) <= 10, s"z-order lost x pruning: ${hitX(zb, 8, 15)}/16")

    // y-selective query: the 1-D layout reads EVERYTHING, z still prunes —
    // the reason z-order exists
    assert(hitY(xb, 8, 15) == 16,
      s"x-sort unexpectedly pruned y (grid assumption broken): ${hitY(xb, 8, 15)}/16")
    assert(hitY(zb, 8, 15) <= 10, s"z-order lost y pruning: ${hitY(zb, 8, 15)}/16")
  }
}
