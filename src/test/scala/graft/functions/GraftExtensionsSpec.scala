package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions session resolves graft_dot without manual registration") {
    // separate session wired through the extensions entry point (the
    // cluster-deployment path: spark.sql.extensions=graft.functions.GraftExtensions).
    // getOrCreate reuses any active session (ignoring withExtensions), so
    // clear active/default first to force a fresh session on the shared context.
    spark // materialize the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d," +
          " graft_intersect_card(array(1L, 2L, 9L), array(2L, 9L, 11L)) AS c")
        .collect().head
      assert(got.getDouble(0) == 11.0)
      assert(got.getInt(1) == 2)
      // an injected AGGREGATE resolves too (theta family)
      val theta = s2.sql(
        "SELECT CAST(round(graft_theta_estimate(graft_theta_agg(v, 1024)))" +
          " AS BIGINT) AS n FROM VALUES ('x'), ('y'), ('x') t(v)")
        .collect().head
      assert(theta.getLong(0) == 2)
    } finally {
      // keep the shared test session (same JVM) as the active one
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("batch session_window agrees with the lag-based sessionization (q26)") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // session_window needs a timestamp; events.ts arrives as nanos LONG
    val ev = graft.analytics.Ops.normalizeEventTs(
      spark.read.parquet(s"$sf/events.parquet"))
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
    val viaSessionWindow = ev
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .count()
      .groupBy("user_id").count()
      .withColumnRenamed("count", "n_sessions")
    val viaLag = graft.SparkEntry.queries("q26_sessionize")(spark, sf)
      .select("user_id", "n_sessions")
    val a = viaSessionWindow.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaLag.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "session_window and lag-based sessionization disagree")
  }
}
