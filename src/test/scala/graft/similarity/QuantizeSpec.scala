package graft.similarity

import graft.SparkSpec

/** q67 numerical contract: symmetric max-abs int8 quantization bounds the
  * per-element rounding error by scale/2, so reconstruction RMSE can never
  * exceed scale/2 either. A violation means the quantize/dequantize
  * arithmetic drifted (wrong rounding mode, off-by-one in the 127 range). */
class QuantizeSpec extends SparkSpec {

  test("reconstruction RMSE <= scale/2 for every vector at sf0.001") {
    val rows = graft.SparkEntry.queries("q67_quantize_embeddings")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val rmse = r.getAs[Double]("rmse")
      assert(rmse <= scale / 2 + 1e-9,
        s"vec ${r.get(0)}: rmse $rmse exceeds scale/2 = ${scale / 2}")
      assert(rmse >= 0.0 && scale >= 0.0)
    }
  }
}
