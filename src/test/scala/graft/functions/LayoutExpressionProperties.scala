package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the layout/pruning expressions (seeded
  * raw ScalaCheck, the PipelineProperties pattern — deterministic).
  *
  * ZOrder2 (Morton interleave), ∀ 32-bit a, b:
  *  - bit-exact vs an independent bit-by-bit reference;
  *  - deinterleave round-trips (no bit lost or aliased);
  *  - axis monotonicity: fixing one coordinate, z strictly increases with
  *    the other — the property min/max skipping relies on (a z-range slice
  *    bounds each dimension);
  *  - locality bound: z(a,b) fits in 2·max(bits(a), bits(b)) bits, so
  *    16-bit dims always produce 32-bit keys (the oracle-overflow
  *    guarantee q91 depends on). */
class LayoutExpressionProperties extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed")))
    }

  private def refInterleave(a: Long, b: Long): Long = {
    var z = 0L; var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L; var i = 0
    while (i < 32) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  private val gen32 = Gen.chooseNum(0L, 0xFFFFFFFFL)
  private val genPair = Gen.zip(gen32, gen32)

  test("interleave matches the bit-by-bit reference on random 32-bit pairs") {
    forAll(genPair, 500) { case (a, b) =>
      assert(ZOrder2.interleave(a, b) == refInterleave(a, b), s"($a, $b)")
    }
  }

  test("deinterleave round-trips: no bit lost, no aliasing") {
    forAll(genPair, 500) { case (a, b) =>
      assert(deinterleave(ZOrder2.interleave(a, b)) == ((a, b)), s"($a, $b)")
    }
  }

  test("axis monotonicity: z strictly increases along each fixed-other axis") {
    val gen = Gen.zip(gen32, Gen.chooseNum(0L, 0xFFFFFFFEL))
    forAll(gen, 300) { case (fixed, v) =>
      assert(ZOrder2.interleave(v, fixed) < ZOrder2.interleave(v + 1, fixed),
        s"a-axis at ($v, $fixed)")
      assert(ZOrder2.interleave(fixed, v) < ZOrder2.interleave(fixed, v + 1),
        s"b-axis at ($fixed, $v)")
    }
  }

  test("16-bit dims always yield non-negative 32-bit z keys (oracle-overflow bound)") {
    val gen16 = Gen.chooseNum(0L, 0xFFFFL)
    forAll(Gen.zip(gen16, gen16), 300) { case (a, b) =>
      val z = ZOrder2.interleave(a, b)
      assert(z >= 0L && z <= 0xFFFFFFFFL, s"($a, $b) -> $z")
    }
  }
}
