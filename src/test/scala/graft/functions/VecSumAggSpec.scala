package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The typed Aggregator path must agree with the posexplode path (q56) —
  * same centroids, one array-row per group through the shuffle instead of
  * dim rows per vector. */
class VecSumAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("VecSumAgg centroids == q56 posexplode centroids on the testdata") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // parity precondition: dividing the aggregator's sum by count(*) only
    // equals q56's per-(label,pos) denominators when every vector is
    // non-null and same-dimension — pin that the corpus satisfies it
    assert(emb.filter(col("embedding").isNull).isEmpty)
    assert(emb.select(size(col("embedding"))).distinct().count() == 1)
    val agg = emb
      .groupBy("label")
      .agg(udaf(VecSumAgg).apply(col("embedding")).as("vsum"),
        count(lit(1)).as("n"))
      .select(col("label"), posexplode(col("vsum")),
        col("n"))
      .select(col("label"), col("pos").cast("long").as("pos"),
        round(col("col") / col("n"), 4).as("centroid_v"))

    val q56 = graft.SparkEntry.queries("q56_vector_centroid")(spark, sf)
      .select(col("label"), col("pos"),
        round(col("centroid_v"), 4).as("centroid_v"))

    // same (label, pos) grid, values equal at 4 dp (q56 quantizes inputs
    // to 1e-6 micro-units; the aggregator sums raw floats)
    assert(agg.count() == q56.count())
    val joined = agg.as("a").join(q56.as("b"), Seq("label", "pos"))
      .filter(abs(col("a.centroid_v") - col("b.centroid_v")) > 1e-3)
    assert(joined.isEmpty, "aggregator and explode paths diverge")
  }

  test("mutable buffer handles ragged/null input defensively") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0f, 2.0f)),
      (1, Seq(3.0f)), // shorter vector: only shared dims accumulate
      (1, null.asInstanceOf[Seq[Float]])
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(udaf(VecSumAgg).apply(col("v")).as("s"))
      .collect().head.getSeq[Double](1)
    assert(out == Seq(4.0, 2.0))
  }
}
