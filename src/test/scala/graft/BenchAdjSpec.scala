package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-adjudication kernel (BenchAdj): reference parsing and
  * the re-time flag predicate — the pure pieces of the r12 contention
  * instrumentation (VERDICT r11 punch #1). The end-to-end behavior (a
  * poisoned window visible in the artifact's ambient series + retime
  * pairs) is demonstrated by the synthetic-load A/B recorded in
  * BASELINE.md round-12. */
class BenchAdjSpec extends AnyFunSuite {

  test("parseRefMap extracts q-keyed values and the sf field, nothing else") {
    // the full-map artifact ALSO carries ts (same q keys, start OFFSETS),
    // ambient and retimed — none may leak into the duration map
    val json = """{"metric":"total","value":280.867,"unit":"sec",""" +
      """"queries":{"q01":1.4,"q107b":5.5,"q36b":4.7,"q242":2.5},""" +
      """"ctrl":"q07","ambient":[[0,0.4],[163,2]],""" +
      """"retimed":{"q180":[7.9,3.5]},"retimed_total":391.332,""" +
      """"ts":{"q01":0.3,"q107b":99.4,"q36b":350.1,"q242":401.9},""" +
      """"failed":["q99"],"sf":"0.1"}"""
    val (m, sf) = BenchAdj.parseRefMap(json)
    assert(m === Map("q01" -> 1.4, "q107b" -> 5.5, "q36b" -> 4.7,
      "q242" -> 2.5))
    assert(sf === Some("0.1"))
    // "value":280.867, the failed-array entry, the retimed pair and the
    // ts OFFSETS must not leak in (ts would silently poison re-timing)
    assert(!m.contains("value") && !m.contains("q99") && !m.contains("q180"))
    assert(m("q242") === 2.5, "ts offset must not overwrite the duration")
  }

  test("parseRefMap on the r12 closing artifact shape: durations, not offsets") {
    val src = scala.io.Source.fromFile("BENCH_r12_builder.json", "UTF-8")
    val json = try src.mkString finally src.close()
    val (m, _) = BenchAdj.parseRefMap(json)
    // q01 ran early: its ts offset is small but its DURATION is what the
    // map must hold; the artifact's own ts entry for a late query is far
    // larger than any plausible duration — assert no value looks like an
    // end-of-run offset
    assert(m.values.forall(_ < 200), "an offset leaked into the ref map")
    assert(m.size >= 260)
  }

  test("parseRefMap on the COMMITTED bench_ref.json: full catalog, sf0.1") {
    val src = scala.io.Source.fromFile("bench_ref.json", "UTF-8")
    val (m, sf) = try BenchAdj.parseRefMap(src.mkString) finally src.close()
    assert(sf === Some("0.1"))
    assert(m.size >= 250, s"reference map too small: ${m.size}")
    assert(m.keys.forall(_.startsWith("q")))
    assert(m.values.forall(v => v >= 0 && v < 1000))
  }

  test("flagged: >3x-of-ref AND >0.5s absolute AND ref floored at 0.15s") {
    val ref = Map("q01" -> 1.4, "q27" -> 0.3, "q02" -> 0.02, "q36b" -> 4.7)
    val timings = Seq(
      "q01_pricing" -> 9.6,    // 6.9x ref -> flagged (the r10 q01 artifact)
      "q27_foo" -> 15.0,       // 50x ref -> flagged (the r11 driver mover)
      "q02_bar" -> 0.4,        // 0.4 < AbsFloor -> not flagged (jitter band)
      "q36b_lsh" -> 5.5,       // 1.2x ref -> healthy
      "q245_new" -> 80.0)      // absent from ref -> never flagged
    assert(BenchAdj.flagged(timings, ref) ===
      Seq("q01_pricing", "q27_foo"))
  }

  test("flagged: sub-floor refs use the 0.15s floor, not the raw ref") {
    // ref 0.02s, measured 0.44s is 22x raw but within 3x of the floor:
    // sub-0.15s rows are scheduler overhead (BASELINE.md), ratios there
    // are noise. 0.46s would exceed 3x floor but sits under AbsFloor.
    val ref = Map("q03" -> 0.02)
    assert(BenchAdj.flagged(Seq("q03_x" -> 0.44), ref).isEmpty)
    assert(BenchAdj.flagged(Seq("q03_x" -> 0.46), ref).isEmpty)
    assert(BenchAdj.flagged(Seq("q03_x" -> 0.51), ref) === Seq("q03_x"))
  }

  test("shortId truncates at the first underscore") {
    assert(BenchAdj.shortId("q107b_lsh_canonical_md5") === "q107b")
    assert(BenchAdj.shortId("q01") === "q01")
  }

  test("retimeSet: ratio flags UNION top-10 slowest above the abs floor (r13 #7)") {
    // The r13 judge rerun's q149 sat at 2.78x its ref — under the 3x
    // trigger — yet was the run's 2nd-slowest row; the top-10 rule must
    // catch exactly that shape, ref or no ref.
    val ref = Map("q01" -> 1.4, "q149" -> 7.2)
    val timings = (1 to 15).map(i => (f"q9$i%02d_tail" -> (0.6 + i * 0.1))) ++
      Seq("q149_setsim" -> 20.0,  // 2.78x ref: NOT ratio-flagged, but slowest
        "q01_pricing" -> 9.6,     // 6.9x ref: ratio-flagged
        "q02_tiny" -> 0.4)        // under AbsFloor: never re-timed
    val set = BenchAdj.retimeSet(timings, ref)
    assert(set.contains("q149_setsim"), "top-10 rule must catch the 2.78x heavyweight")
    assert(set.contains("q01_pricing"))
    assert(!set.contains("q02_tiny"))
    // flags + top-10, de-duplicated: q01/q149 are both in the top 10, so
    // the set is exactly the 10 slowest here
    assert(set.size === 10, s"expected 10 distinct rows, got ${set.size}: $set")
    // and with NO reference the heaviest rows are still re-timed
    val noRef = BenchAdj.retimeSet(timings, Map.empty)
    assert(noRef.contains("q149_setsim") && noRef.size === 10)
  }
}
