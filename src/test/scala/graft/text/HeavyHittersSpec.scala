package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q92's correctness argument: DataSketches frequent-items estimates are
  * EXACT while a sketch's distinct-item count stays under its tracked
  * capacity, and COMBINE over partial sketches equals one direct build.
  * Pinned on a synthetic skewed corpus where both properties must hold
  * bit-for-bit; q92 itself is rows-only at the driver (sketch internals
  * are engine-specific). */
class HeavyHittersSpec extends SparkSpec {

  // 3 "sources" with overlapping skewed vocabularies: token t_i appears
  // (30 - i) times per source it belongs to; 60 distinct tokens << 4096
  private def corpus() = {
    import spark.implicits._
    val rows = for {
      src <- Seq("s1", "s2", "s3")
      i <- 0 until 40
      tok = s"t${(src.last - '1') * 10 + i}" // s1: t0..t39, s2: t10..t49, s3: t20..t59
      _ <- 0 until (40 - i)
    } yield (src, tok)
    rows.toDF("source", "token")
  }

  test("combine-of-partials equals direct build equals exact counts (capacity regime)") {
    val df = corpus()
    val merged = df
      .groupBy("source")
      .agg(expr("approx_top_k_accumulate(token, 4096)").as("sk"))
      .agg(expr("approx_top_k_combine(sk, 4096)").as("csk"))
      .select(explode(expr("approx_top_k_estimate(csk, 20)")).as("hh"))
      .select(col("hh.item").as("token"), col("hh.count").as("est"))
    val direct = df
      .agg(expr("approx_top_k_accumulate(token, 4096)").as("sk"))
      .select(explode(expr("approx_top_k_estimate(sk, 20)")).as("hh"))
      .select(col("hh.item").as("token"), col("hh.count").as("est"))
    val exact = df.groupBy("token").agg(count(lit(1)).as("est"))
      .orderBy(col("est").desc, col("token").asc).limit(20)

    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val g = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == g, s"combined sketch diverged from direct build:\n$m\nvs\n$g")
    assert(m == e, s"sketch estimates not exact under capacity:\n$m\nvs exact\n$e")
  }

  test("q92 is deterministic across runs at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val r1 = graft.SparkEntry.queries("q92_heavy_hitters")(spark, sf)
      .collect().map(_.toString).toSeq
    val r2 = graft.SparkEntry.queries("q92_heavy_hitters")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(r1 == r2, "q92 result changed between runs")
    assert(r1.nonEmpty, "q92 returned no heavy hitters")
  }
}
