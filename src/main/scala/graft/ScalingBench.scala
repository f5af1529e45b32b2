package graft

import org.apache.spark.sql.SparkSession

/** Scaling datapoints for the per-query baseline comparison (BASELINE.md):
  * run the named catalog queries at sf0.001 / sf0.01 / sf0.1 in ONE JVM
  * (median of 3 noop-sink materializations after a codegen warm-up pass)
  * and print a single JSON line. Pairs with `tools/scaling_check.py`, which
  * times the same queries' DuckDB oracles at the same three SFs — together
  * they show whether a Spark:DuckDB gap is fixed scheduler overhead (flat
  * Spark seconds, falling ratio as data grows) or a real O(n) divergence.
  */
object ScalingBench {

  private val DefaultQueries = Seq(
    "q12_revenue_by_nation", "q49_asof_join", "q61_range_frame", "q63_gold_kpis")
  // Dev-only: SPARK_GRAFT_SF_DIRS overrides the measured corpora with a
  // comma list of ABSOLUTE table dirs (e.g. the constructed x10 worst-case
  // corpus at target/scale_x10) — the driver never sets it.
  private val Sfs = sys.env.get("SPARK_GRAFT_SF_DIRS")
    .map(_.split(',').toSeq.filter(_.nonEmpty))
    .getOrElse(Seq("sf0.001", "sf0.01", "sf0.1"))

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def median3(body: => Unit): Double =
    (1 to 3).map(_ => timed(body)).sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Dev-only (same contract as Bench): SPARK_GRAFT_CONF injects "k=v;k=v"
    // session confs — A/B adjudication of conf-keyed paths (e.g.
    // graft.cc.localEdgeLimit=0 re-measures the distributed CC loop).
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).filter(_.nonEmpty)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String, sf: String): Unit = {
      // cache-cold per invocation (the r14 Bench contract): queries that
      // persist() internal frames must never serve a later run from the
      // CacheManager's canonicalized-plan match
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark,
        if (sf.startsWith("/")) sf else s"/root/testdata/$sf")
        .write.mode("overwrite").format("noop").save()
    }
    // codegen + JIT warm-up: every (query, sf) shape once
    for (n <- names; sf <- Sfs) run(n, sf)
    // Untimed warm-read of every measured corpus (r15, VERDICT r14 #8 —
    // the Bench.scala warm-read ported here): the sandbox drops the page
    // cache mid-session, so without this the first timed run of a query
    // absorbs a cold parquet read and subset medians carry a 2-5 s box
    // spread (the r14 q62/q107 adjudication noise). Same dev knob as
    // Bench: SPARK_GRAFT_WARMREAD=0 reproduces the cold-read behaviour.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMREAD", "1") != "0")
      Sfs.map(sf => if (sf.startsWith("/")) sf else s"/root/testdata/$sf")
        .foreach { dir =>
          Option(new java.io.File(dir).listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet"))
            .foreach { f =>
              try spark.read.parquet(f.getPath)
                .write.mode("overwrite").format("noop").save()
              catch { case _: Throwable => () }
            }
        }
    val out = names.map { n =>
      val per = Sfs.map(sf => s""""$sf":${f"${median3(run(n, sf))}%.3f"}""")
      s""""$n":{${per.mkString(",")}}"""
    }
    spark.stop()
    println(out.mkString("{", ",", "}"))
  }
}
