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

  test("q193 velocity: pre-1970 events count into bursts and exact ties are peers") {
    // hand-computed (trailing 24 h): user 1's three events all sit inside
    // one day of each other (bursts 1, 2, 3 — negative nanos included);
    // user 2's tied pair are RANGE peers (burst 2 each) and the later
    // event sees all three; user 3 is a singleton. Nothing reaches the
    // >= 6 flag threshold.
    val out = graft.SparkEntry.queries("q193_velocity")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("max_burst"),
          r.getAs[Long]("n_flagged"), r.getAs[Long]("velocity_flag")))).toMap
    assert(out(1L) == (3L, 3L, 0L, 0L), s"user 1: ${out(1L)}")
    assert(out(2L) == (3L, 3L, 0L, 0L), s"user 2: ${out(2L)}")
    assert(out(3L) == (1L, 1L, 0L, 0L), s"user 3: ${out(3L)}")
  }

  test("q27 json extract: null and malformed props become NULL, not errors") {
    val out = graft.SparkEntry.queries("q27_json_extract")(spark, dir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(3L).isEmpty && out(4L).isEmpty && out(5L).contains(5L))
  }

  test("q96 gap-fill: negative days floor correctly, spans stay per-user") {
    // hand-computed: user 1's pre-1970 pair lands on day -1 (floor of
    // -6e9 µs / 86400e6; truncation would give 0), its +40 min event on
    // day 0 — a 2-day span with no gap; users 2/3 are day-0 only
    val out = graft.SparkEntry.queries("q96_gap_fill")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val expected = Map(
      (1L, -1L) -> (2L, 3.0), (1L, 0L) -> (1L, 3.0),
      (2L, 0L) -> (3L, 3.0), (3L, 0L) -> (1L, 0.0))
    assert(out == expected, s"got $out")
  }

  test("q97 retention: pre-1970 cohort week is -1, offsets count from it") {
    val out = graft.SparkEntry.queries("q97_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: weeks {-1, 0} → cohort -1, offsets {0, 1}; users 2/3: cohort 0
    val expected = Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L, (0L, 0L) -> 2L)
    assert(out == expected, s"got $out")
  }

  test("q98 funnel: no signups in the corpus → empty result, no crash") {
    assert(graft.SparkEntry.queries("q98_funnel")(spark, dir).collect().isEmpty)
  }

  test("q98 funnel: 7-day window is inclusive and pre-1970 signup days floor to -1") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-adv-funnel").toString
    val Day7Us = 7L * 86400000000L
    val rows = Seq(
      // u1: pre-1970 signup; purchase at EXACTLY +7 days → converted
      (0L, -100L * MinNs, 1L, "signup", 0.0, null.asInstanceOf[String]),
      (1L, (-100L * MinNs) + Day7Us * 1000L, 1L, "purchase", 1.0, null.asInstanceOf[String]),
      // u2: signup at epoch; purchase 1 µs past the window → NOT converted
      (2L, 0L, 2L, "signup", 0.0, null.asInstanceOf[String]),
      (3L, (Day7Us + 1L) * 1000L, 2L, "purchase", 1.0, null.asInstanceOf[String]),
      // u3: signup, no purchase; u4: purchase BEFORE signup
      (4L, 10L * MinNs, 3L, "signup", 0.0, null.asInstanceOf[String]),
      (5L, 5L * MinNs, 4L, "purchase", 1.0, null.asInstanceOf[String]),
      (6L, 10L * MinNs, 4L, "signup", 0.0, null.asInstanceOf[String]))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("q98_funnel")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // s_day -1: u1 converted at the inclusive boundary; s_day 0: u2 (1 µs
    // late), u3 (no purchase), u4 (purchase precedes signup) all fail
    val expected = Map(-1L -> (1L, 1L, 1.0), 0L -> (3L, 0L, 0.0))
    assert(out == expected, s"got $out")
  }
}
