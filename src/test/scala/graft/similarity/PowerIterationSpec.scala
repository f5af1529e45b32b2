package graft.similarity

import graft.SparkSpec

/** q76's eigen-math pinned against an engine-free Scala replication (the
  * DuckDB oracle checks cross-engine value parity; THIS checks the
  * algorithm computes what power iteration is supposed to compute):
  *  - scores match a driver-side brute-force run of the same two steps
  *    (micro-unit sums, same normalization) to 1e-6;
  *  - the iterated direction captures at least as much second-moment
  *    variance as the v0 init direction (power iteration's monotonicity);
  *  - output is deterministic across runs (fixed init → fixed sign). */
class PowerIterationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def roundAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v)); v.map(_ / n)
  }

  test("q76 scores match a brute-force power iteration; variance captured grows") {
    val rows = graft.analytics.Ops.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val es = rows.map(_._2)
    val v0 = normalize(rows.find(_._1 == 0L).get._2.clone())

    var dir = v0
    for (_ <- 1 to 2) {
      val sums = Array.fill(dir.length)(0L)
      for (e <- es) {
        val s = dot(e, dir)
        var j = 0
        while (j < e.length) { sums(j) += roundAway(s * e(j) * 1e6); j += 1 }
      }
      dir = normalize(sums.map(_.toDouble / 1e6))
    }
    val expected = rows.map { case (id, e) => id -> dot(e, dir) }.toMap

    val got = graft.SparkEntry.queries("q76_power_iteration")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((id, s) <- expected)
      assert(math.abs(got(id) - s) <= 1e-6, s"vec $id: got ${got(id)}, want ~$s")

    // power iteration must not lose second-moment variance vs the init
    val var0 = es.map(e => { val s = dot(e, v0); s * s }).sum
    val var2 = es.map(e => { val s = dot(e, dir); s * s }).sum
    assert(var2 >= var0, s"iterated direction captures less variance ($var2 < $var0)")
  }

  test("q76 is deterministic across runs") {
    def run() = graft.SparkEntry.queries("q76_power_iteration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(run() == run())
  }
}
