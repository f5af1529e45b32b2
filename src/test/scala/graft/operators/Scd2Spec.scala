package graft.operators

import graft.SparkSpec

/** SCD2 timeline-rebuild contract: version chaining, late-arriving
  * splices, idempotent re-application, deterministic same-instant
  * conflicts, and the current/as-of views. Expected tables are
  * hand-computed. */
class Scd2Spec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def dim(rows: Seq[(String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("merchant_id", "tier", "ts")
  }

  private def collectVersions(df: DataFrame): Set[(String, String, Long, Option[Long], Boolean)] =
    df.collect().map { r =>
      (r.getAs[String]("merchant_id"), r.getAs[String]("tier"),
        r.getAs[Long]("ts"),
        Option(r.getAs[Any]("eff_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current"))
    }.toSet

  test("changes chain into versions; consecutive duplicates collapse") {
    val base = dim(Nil)
    val changes = dim(Seq(
      ("m1", "bronze", 1L), ("m1", "bronze", 2L), // dup state collapses
      ("m1", "silver", 5L),
      ("m2", "gold", 3L)))
    val out = collectVersions(Scd2.rebuild(base, changes, Seq("merchant_id"), "ts"))
    assert(out == Set(
      ("m1", "bronze", 1L, Some(5L), false),
      ("m1", "silver", 5L, None, true),
      ("m2", "gold", 3L, None, true)))
  }

  test("late-arriving change splices INTO history, not onto the end") {
    val v1 = Scd2.rebuild(dim(Nil),
      dim(Seq(("m1", "bronze", 1L), ("m1", "gold", 10L))),
      Seq("merchant_id"), "ts")
    // a t=4 'silver' state arrives after the t=10 version already exists
    val v2 = Scd2.rebuild(v1, dim(Seq(("m1", "silver", 4L))),
      Seq("merchant_id"), "ts")
    assert(collectVersions(v2) == Set(
      ("m1", "bronze", 1L, Some(4L), false),
      ("m1", "silver", 4L, Some(10L), false),
      ("m1", "gold", 10L, None, true)))
  }

  test("re-applying an already-applied batch is a no-op (idempotent)") {
    val batch = dim(Seq(("m1", "bronze", 1L), ("m1", "silver", 5L)))
    val v1 = Scd2.rebuild(dim(Nil), batch, Seq("merchant_id"), "ts")
    val v2 = Scd2.rebuild(v1, batch, Seq("merchant_id"), "ts")
    assert(collectVersions(v1) == collectVersions(v2))
  }

  test("same-instant conflicting states resolve deterministically") {
    val conflict = dim(Seq(("m1", "gold", 5L), ("m1", "silver", 5L)))
    val a = collectVersions(Scd2.rebuild(dim(Nil), conflict, Seq("merchant_id"), "ts"))
    val b = collectVersions(Scd2.rebuild(dim(Nil),
      dim(Seq(("m1", "silver", 5L), ("m1", "gold", 5L))), Seq("merchant_id"), "ts"))
    assert(a == b, "winner must not depend on input order")
    assert(a.size == 1 && a.head._5)
  }

  test("current and as-of views answer point-in-time questions") {
    val v = Scd2.rebuild(dim(Nil), dim(Seq(
      ("m1", "bronze", 1L), ("m1", "silver", 5L), ("m2", "gold", 3L))),
      Seq("merchant_id"), "ts")
    val cur = Scd2.current(v).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cur == Map("m1" -> "silver", "m2" -> "gold"))
    val at2 = Scd2.asOf(v, "ts", 2L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at2 == Map("m1" -> "bronze")) // m2 didn't exist yet
    val at5 = Scd2.asOf(v, "ts", 5L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at5 == Map("m1" -> "silver", "m2" -> "gold"))
  }

  test("rebuild is stable under repartitioning (no ordering assumptions)") {
    val changes = dim((1 to 40).map(i =>
      (s"m${i % 4}", s"tier${i % 3}", i.toLong)))
    val a = collectVersions(Scd2.rebuild(dim(Nil), changes, Seq("merchant_id"), "ts"))
    val b = collectVersions(Scd2.rebuild(dim(Nil), changes.repartition(7),
      Seq("merchant_id"), "ts"))
    assert(a == b)
  }
}
