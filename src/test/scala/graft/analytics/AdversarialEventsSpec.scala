package graft.analytics

import java.nio.file.Files

import graft.SparkSpec

/** Time-series queries over an adversarial events corpus: pre-1970
  * (negative-nanos) timestamps, exact-tie timestamps, single-event users,
  * and empty join matches must neither crash nor produce off-by-one
  * sessions (the floor-division and tiebreak contracts under stress). */
class AdversarialEventsSpec extends SparkSpec {

  private val MinNs = 60L * 1000000000L // one minute in nanos

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-adv-events").toString
    val rows = Seq(
      // user 1: pre-1970 pair 10 min apart (one session), then a post-1970
      // event 2h later by absolute gap (second session)
      (0L, -100L * MinNs, 1L, "click", 1.0, """{"k":1}"""),
      (1L, -90L * MinNs, 1L, "click", 2.0, """{"k":2}"""),
      (2L, 40L * MinNs, 1L, "view", 3.0, """{"k":3}"""),
      // user 2: two events with IDENTICAL timestamps (tie) + one later
      (3L, 10L * MinNs, 2L, "click", 1.0, null),
      (4L, 10L * MinNs, 2L, "view", 1.0, "not json"),
      (5L, 200L * MinNs, 2L, "click", 1.0, """{"k":5}"""),
      // user 3: single event at epoch zero
      (6L, 0L, 3L, "click", 0.0, """{}""")
    )
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // empty orders table (schema-compatible) for q49/q52 join behavior
    Seq.empty[(Long, Long, String, Double, java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("q26 sessionize: pre-1970 gaps and exact ties produce the right session counts") {
    val out = graft.SparkEntry.queries("q26_sessionize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (2L, 3L), s"user 1: ${out(1L)}") // pre-1970 pair + later singleton
    assert(out(2L) == (2L, 3L), s"user 2: ${out(2L)}") // tie pair together, later apart
    assert(out(3L) == (1L, 1L), s"user 3: ${out(3L)}")
  }

  test("q52 range join: ties excluded (strict >), pre-1970 pairs counted") {
    val out = graft.SparkEntry.queries("q52_range_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 30s window, events are >= 10 min apart or exactly tied → no pairs at
    // all (ties fail b_us > us) — the result must be EMPTY, not crash
    assert(out.isEmpty, s"unexpected pairs: $out")
  }

  test("q49 as-of join with an empty orders side returns no rows, no crash") {
    assert(graft.SparkEntry.queries("q49_asof_join")(spark, dir).collect().isEmpty)
  }

  test("q85 sliding windows: true floor bucketing for pre-1970 timestamps") {
    // hand-computed: each event lands in windows (floor(t_us/S) - {0,1})·S;
    // truncating `div` without the negative-remainder correction would put
    // ev0 (-6e9 us, -6.667 slides) in buckets -6/-7 instead of -7/-8
    val S = 900000000L // 15-min slide in micros
    val out = graft.SparkEntry.queries("q85_sliding_windows")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = Map(
      (-8L * S, "click") -> 1L, (-7L * S, "click") -> 2L, (-6L * S, "click") -> 1L,
      (0L, "click") -> 2L, (-S, "click") -> 2L,
      (13L * S, "click") -> 1L, (12L * S, "click") -> 1L,
      (2L * S, "view") -> 1L, (S, "view") -> 1L,
      (0L, "view") -> 1L, (-S, "view") -> 1L)
    assert(out == expected, s"got $out")
  }

  test("q27 json extract: null and malformed props become NULL, not errors") {
    val out = graft.SparkEntry.queries("q27_json_extract")(spark, dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(3L).isEmpty && out(4L).isEmpty && out(5L).contains(5L))
  }
}
