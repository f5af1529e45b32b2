package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q214 (margin-based bitext mining) — pins the property that makes the
  * margin criterion worth having over raw cosine: HUB CANCELLATION.
  *
  * Constructed geometry (64-dim, exact by dot-product arithmetic):
  *  - 5 probes p_j = 0.85·h + sqrt(1-0.85²)·u_j (mutually 0.7225-similar,
  *    0.85-similar to the hub direction h);
  *  - hub H = h — cosine 0.85 to EVERY probe (the "central" vector real
  *    embedding spaces produce for generic/short inputs);
  *  - true match A = 0.8·p_0 + 0.6·w (w fresh axis) — cosine 0.80 to
  *    probe 0 only (0.578 to the rest);
  *  - fillers ⊥ everything.
  *
  * Raw cosine ranks H above A for probe 0 (0.85 > 0.80). The margin rule
  * divides by the endpoints' neighborhood means — H's inflated backward
  * neighborhood (0.85 to all 5 probes) cancels its inflated similarity,
  * while A's sparse neighborhood does not — so the mined pair flips to A.
  * The spec asserts both rankings explicitly (cosine argmax = H, margin
  * argmax = A), accepted-flag consistency, and determinism. */
class BitextMarginSpec extends SparkSpec {

  private val Dim = 64

  private def axis(i: Int, scale: Double): Array[Double] = {
    val a = new Array[Double](Dim); a(i) = scale; a
  }
  private def add(a: Array[Double], b: Array[Double]): Array[Double] =
    a.zip(b).map { case (x, y) => x + y }

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("q214fix").toFile.getAbsolutePath
    val h = axis(0, 1.0)
    val s85 = math.sqrt(1 - 0.85 * 0.85)
    // probes: vec_id % 50 == 0
    val probes = (0 until 5).map { j =>
      (j * 50L, add(axis(0, 0.85), axis(1 + j, s85)))
    }
    val p0 = probes.head._2
    val a = add(p0.map(_ * 0.8), axis(10, 0.6)) // true match of probe 0
    val cands = Seq(
      (1L, a),
      (2L, h), // hub
      (3L, axis(20, 1.0)), // fillers, orthogonal to everything
      (4L, axis(21, 1.0)))
    val rows = (probes ++ cands).map { case (id, v) =>
      (id, v.map(_.toFloat), 0L)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("hub cancellation: cosine argmax is the hub, margin argmax is the true match") {
    val dir = writeFixture()
    val out = graft.SparkEntry.queries("q214_bitext_margin")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap

    // probe 0: margin mines the sparse true match, not the hub…
    val (match0, cos0, margin0, acc0) = out(0L)
    assert(match0 == 1L, s"margin argmax should be the true match, got $match0")
    assert(margin0 > 1.05 && acc0 == 1L)
    // …even though the hub is STRICTLY closer by raw cosine.
    val scored = graft.functions.GraftFunctions.register(spark)
    val byCos = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val p0v = byCos.filter(col("vec_id") === 0L).select("v")
    val cosTop = byCos.filter(col("vec_id") % 50 =!= 0)
      .crossJoin(p0v.select(col("v").as("qv")))
      .select(col("vec_id"),
        expr("round(graft_dot(v, qv) / (sqrt(graft_dot(v, v)) * sqrt(graft_dot(qv, qv))), 6)")
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).first()
    assert(cosTop.getLong(0) == 2L, "fixture lost its teeth: hub is no longer the cosine argmax")
    assert(cosTop.getDouble(1) > cos0, "hub should be strictly closer by raw cosine")

    // the other probes legitimately match the hub (it IS their nearest
    // semantic neighborhood) — the rule cancels hubness, it doesn't ban hubs
    (1 until 5).foreach { j => assert(out(j * 50L)._1 == 2L) }

    // accepted flag is exactly margin >= 1.05
    out.values.foreach { case (_, _, m, acc) =>
      assert((m >= 1.05) == (acc == 1L))
    }

    // determinism
    val again = graft.SparkEntry.queries("q214_bitext_margin")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(again == out)
  }

  test("q215 (IVF-served) vs the q214 anchor: total relation, real cosines, agreement floor") {
    val sf = "/root/testdata/sf0.01"
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(4))))
        .toMap
    val anchor = rows("q214_bitext_margin")
    val idx = rows("q215_bitext_margin_indexed")

    // relation is TOTAL over the probe slice — exactly the anchor's keys
    assert(idx.keySet == anchor.keySet,
      "q215 must report every probe (left-join totality)")

    // surfaced cosines are REAL cosines: the indexed (query, match) sim
    // equals the exact q39-arithmetic cosine recomputed from the vectors
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val v = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    idx.foreach { case (q, (m, sim, _)) =>
      m.foreach { mid =>
        assert(math.abs(cos(v(q), v(mid)) - sim.get) <= 1e-6,
          s"q215 surfaced a non-real cosine for ($q, $mid)")
      }
    }

    // agreement floors vs the exact anchor (quantizer recall is the only
    // legitimate divergence; floors leave room for the adversarial
    // near-random fixture geometry, the q213 argument). Measured at
    // sf0.01: match 0.60 (the per-probe ARGMAX is the recall-fragile
    // readout — near-random sims bunch within ~0.01, so one mis-celled
    // neighbor flips it), accept 1.00 (the operational verdict is
    // threshold-stable).
    val keys = anchor.keySet
    val matchAgree = keys.count(k => idx(k)._1 == anchor(k)._1).toDouble / keys.size
    val accAgree = keys.count(k => idx(k)._3 == anchor(k)._3).toDouble / keys.size
    info(f"match agreement vs q214: $matchAgree%.3f, accept agreement: $accAgree%.3f " +
      s"(probes=${keys.size}, anchor accepted=${anchor.values.count(_._3 == 1L)}, " +
      s"indexed accepted=${idx.values.count(_._3 == 1L)})")
    assert(matchAgree >= 0.5, f"mined-match agreement $matchAgree%.3f below floor")
    assert(accAgree >= 0.8, f"accept-verdict agreement $accAgree%.3f below floor")

    // determinism
    assert(rows("q215_bitext_margin_indexed") == idx)
  }
}
