package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-based invariants for the theta family (seeded raw ScalaCheck,
  * the LayoutExpressionProperties pattern — deterministic): for random
  * multisets with random duplication, random grouping and random
  * partitioning,
  *  - estimate == exact distinct count below capacity;
  *  - union rollup over ANY grouping is byte-identical to a direct build
  *    (the mergeability contract the 100 TB rollup pattern rests on);
  *  - the q154 matrix identity |A∩B| + |A\B| = |A| holds exactly.
  * Ten seeded corpora per property — each a Spark round trip, so the
  * suite stays seconds-sized while covering the input space the
  * deterministic spec's fixed cases cannot. */
class ThetaSketchProperties extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed")))
    }

  // a multiset of string keys with duplication: distinct domain size,
  // draw count, and a salt separating corpora
  private val corpusGen: Gen[(Int, Int, Int)] = for {
    domain <- Gen.choose(1, 900) // below nomEntries 1024 -> exact regime
    draws <- Gen.choose(1, 4000)
    salt <- Gen.choose(0, 1 << 20)
  } yield (domain, draws, salt)

  test("estimate equals exact distinct count below capacity (random multisets)") {
    val s = { GraftFunctions.register(spark); spark }
    import s.implicits._
    forAll(corpusGen, 10) { case (domain, draws, salt) =>
      val vals = (0 until draws).map(i => s"k${salt}_${(i * 7919) % domain}")
      val est = vals.toDF("v").repartition(1 + salt % 7)
        .agg(expr("CAST(round(graft_theta_estimate(graft_theta_agg(v, 1024))) AS BIGINT)")
          .as("n")).head().getLong(0)
      val exact = vals.distinct.size.toLong
      assert(est == exact, s"domain=$domain draws=$draws salt=$salt: $est != $exact")
    }
  }

  test("union rollup over any grouping is byte-identical to a direct build") {
    val s = { GraftFunctions.register(spark); spark }
    import s.implicits._
    forAll(corpusGen, 10) { case (domain, draws, salt) =>
      val groups = 1 + salt % 9
      val rows = (0 until draws)
        .map(i => (s"g${i % groups}", s"k${salt}_${(i * 104729) % domain}"))
      val df = rows.toDF("g", "v")
      val rolled = df.groupBy("g")
        .agg(expr("graft_theta_agg(v, 1024)").as("sk"))
        .agg(expr("graft_theta_union(sk, 1024)").as("sk"))
        .head().getAs[Array[Byte]](0)
      val direct = df.agg(expr("graft_theta_agg(v, 1024)").as("sk"))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(rolled, direct),
        s"domain=$domain draws=$draws groups=$groups: rollup != direct")
    }
  }

  test("matrix identity |A∩B| + |A\\B| = |A| holds exactly (random set pairs)") {
    val s = { GraftFunctions.register(spark); spark }
    import s.implicits._
    forAll(corpusGen, 10) { case (domain, draws, salt) =>
      // A and B drawn from the same domain with different strides ->
      // random (often partial) overlap
      val a = (0 until math.min(draws, 900)).map(i => s"k${(i * 13 + salt) % domain}")
      val b = (0 until math.min(draws, 900)).map(i => s"k${(i * 17) % domain}")
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("side", "v")
      val row = df.groupBy("side").agg(expr("graft_theta_agg(v, 1024)").as("sk"))
        .groupBy().pivot("side", Seq("a", "b")).agg(first("sk"))
        .select(
          expr("CAST(round(graft_theta_estimate(a)) AS BIGINT)").as("na"),
          expr("CAST(round(graft_theta_estimate(graft_theta_intersect2(a, b))) AS BIGINT)"),
          expr("CAST(round(graft_theta_estimate(graft_theta_anotb(a, b))) AS BIGINT)"))
        .head()
      assert(row.getLong(1) + row.getLong(2) == row.getLong(0),
        s"domain=$domain salt=$salt: ${row.getLong(1)} + ${row.getLong(2)} != ${row.getLong(0)}")
      // and |A| itself is exact
      assert(row.getLong(0) == a.distinct.size.toLong)
    }
  }
}
