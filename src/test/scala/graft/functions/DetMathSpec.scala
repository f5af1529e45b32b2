package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the three-way bit-equality chain behind the deterministic ln:
  * Spark Column tree == plain-JVM reference (same IEEE op sequence), and
  * the reference is within 1 ULP of true ln. The DuckDB side of the chain
  * (SQL twin == CPython == JVM, bit-for-bit over x ∈ [1, 3e5]) was proven
  * in the bring-up prototype and is re-proven by every 3-SF hash gate on a
  * detLn-using query. */
class DetMathSpec extends SparkSpec {

  test("TREE detLnLong (the SQL twin's op sequence) is bit-identical to the JVM impl over [1, 1e5]") {
    // This is the cross-engine proof: the tree evaluates the same IEEE op
    // sequence the DuckDB SQL twin does; the production single-node
    // expression calls the JVM impl directly, so tree == JVM closes the
    // chain expression == tree == SQL twin.
    import spark.implicits._
    val rows = spark.range(1, 100001).toDF("x")
      .select(col("x"), DetMath.treeLnLong(col("x")).as("tree"),
        DetMath.detLnLong(col("x")).as("node"))
      .collect()
    rows.foreach { r =>
      val x = r.getLong(0)
      val expect = DetMath.lnLong(x)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"treeLnLong($x) tree=${r.getDouble(1)} JVM=$expect")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"detLnLong($x) node=${r.getDouble(2)} JVM=$expect")
    }
  }

  test("JVM reference is within 1 ULP of Math.log over [1, 1e6] and big longs") {
    val xs = (1L to 1000000L by 17L) ++ Seq(1L, 2L, 3L, 1000000L,
      (1L << 40) + 12345L, (1L << 62) + 999L, Long.MaxValue)
    xs.foreach { x =>
      val d = DetMath.lnLong(x)
      val t = Math.log(x.toDouble)
      assert(math.abs(d - t) <= Math.ulp(t),
        s"lnLong($x)=$d vs Math.log=$t diff=${math.abs(d - t)}")
    }
  }

  test("expression tree size stays O(1): composed softplus plans serialize small") {
    // the r08 bring-up regression: Column-TREE composition of
    // ln(1 + exp(-z)) serialized to a ~273 MiB task binary and 217 s on
    // q197. The single-node expressions must keep the plan tiny.
    val sp = DetMath.detLnDoubleGe1(lit(1.0) + DetMath.detExp(-col("x")))
    val plan = spark.range(1).toDF().selectExpr("cast(id as double) as x")
      .select(sp.as("sp")).queryExecution.analyzed
    var nodes = 0
    plan.foreach(p => p.expressions.foreach(_.foreach(_ => nodes += 1)))
    assert(nodes < 50, s"composed softplus expression has $nodes nodes")
  }

  test("detLnRatio(a,b) == detLnLong(a) - detLnLong(b) bit-for-bit") {
    import spark.implicits._
    val df = Seq((3L, 7L), (1L, 60000L), (999L, 1000L), (123456789L, 7L))
      .toDF("a", "b")
      .select(DetMath.detLnRatio(col("a"), col("b")).as("r"),
        (DetMath.detLnLong(col("a")) - DetMath.detLnLong(col("b"))).as("d"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("TREE detExp (the SQL twin's op sequence) is bit-identical to the JVM impl over [-80, 80]") {
    import spark.implicits._
    val rows = spark.range(0, 160001).toDF("i")
      .select(((col("i") - lit(80000L)).cast("double") / lit(1000.0)).as("x"))
      .select(col("x"), DetMath.treeExp(col("x")).as("tree"),
        DetMath.detExp(col("x")).as("node"))
      .collect()
    rows.foreach { r =>
      val expect = DetMath.expDouble(r.getDouble(0))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"treeExp(${r.getDouble(0)}) tree=${r.getDouble(1)} JVM=$expect")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"detExp(${r.getDouble(0)}) node=${r.getDouble(2)} JVM=$expect")
    }
  }

  test("JVM detExp reference is within 2 ULP of Math.exp over [-80, 80]") {
    val rnd = new scala.util.Random(7)
    (1 to 200000).foreach { _ =>
      val x = rnd.nextDouble() * 160.0 - 80.0
      val d = DetMath.expDouble(x)
      val t = Math.exp(x)
      assert(math.abs(d - t) <= 2 * Math.ulp(t), s"expDouble($x)=$d vs $t")
    }
  }

  test("TREE detLnDoubleGe1 matches JVM impl and Math.log (softplus range)") {
    import spark.implicits._
    val rows = spark.range(0, 100000).toDF("i")
      .select((lit(1.0) + col("i").cast("double") / lit(7.0)).as("w"))
      .select(col("w"), DetMath.treeLnDoubleGe1(col("w")).as("tree"),
        DetMath.detLnDoubleGe1(col("w")).as("node"))
      .collect()
    rows.foreach { r =>
      val expect = DetMath.lnDoubleGe1(r.getDouble(0))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(expect))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(expect))
      val t = Math.log(r.getDouble(0))
      assert(math.abs(expect - t) <= 2 * Math.ulp(math.max(t, 1e-300)) + 1e-18)
    }
  }

  test("detSigmoid stays in (0,1] and matches 1/(1+exp(-x)) to 4 ULP") {
    val xs = Seq(-40.0, -8.5, -1.0, 0.0, 1e-9, 0.3, 2.0, 17.5, 40.0)
    xs.foreach { x =>
      val d = 1.0 / (1.0 + DetMath.expDouble(-x))
      val t = 1.0 / (1.0 + Math.exp(-x))
      // (0, 1] not (0, 1): for x ≥ ~37 the true sigmoid is within half an
      // ULP of 1.0 and both engines round it TO 1.0
      assert(d > 0.0 && d <= 1.0)
      assert(math.abs(d - t) <= 4 * Math.ulp(t), s"sigmoid($x)")
    }
  }

  test("SQL twin textually parenthesizes every operation (no precedence drift)") {
    val sql = DetMathSql.lnLong("c")
    // Every binary op the twin emits sits inside its own parentheses; a
    // quick structural check that nothing leaks to parser precedence.
    assert(sql.count(_ == '(') == sql.count(_ == ')'))
    assert(sql.contains("0.6931471805599453"))
    assert(sql.contains("length(bin(CAST(c AS BIGINT)))"))
    // 17 Horner coefficients present
    DetMath.Ks.foreach(k => assert(sql.contains(s"CAST($k.0 AS DOUBLE)")))
  }
}
