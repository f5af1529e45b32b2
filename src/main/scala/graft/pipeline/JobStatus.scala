package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Job-state reporting — the stand-in for the reference's EventBridge rule
  * on Glue job `state = FAILED` → SNS alert (`README.md:96-104`). Each
  * pipeline stage writes one JSON artifact with status, timing, the error
  * (on failure), and stage metrics (e.g. the audit stage's DQ observation
  * summary) to `<outDir>/<stage>_<runDate>.json`. A monitoring system tails
  * that directory exactly as SNS subscribers consume the topic; on a real
  * cluster `outDir` is an object-store prefix (the write goes through the
  * Hadoop FS API, so hdfs:// and s3a:// roots work unchanged).
  */
object JobStatus {

  final case class StageReport(stage: String, status: String, startMs: Long,
      durationMs: Long, error: Option[String], metricsJson: Option[String]) {
    def toJson: String = {
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val err = error.map(e => "\"" + esc(e) + "\"").getOrElse("null")
      // metricsJson is already a JSON object — embedded raw, not escaped
      val met = metricsJson.getOrElse("null")
      s"""{"stage":"${esc(stage)}","status":"$status","start_ms":$startMs,""" +
        s""""duration_ms":$durationMs,"error":$err,"metrics":$met}"""
    }
  }

  /** Wraps each stage in try/catch + timing and persists the report. A
    * failing stage writes its FAILED artifact BEFORE rethrowing, so the
    * alert exists even when the driver dies with the job. */
  final class Reporter(spark: SparkSession, outDir: String, runDate: String) {

    def stage[T](name: String)(body: => T): T = stageWithMetrics(name)(body)(_ => None)

    /** `metrics` maps the stage result to an optional raw-JSON metrics
      * object (e.g. the audit stage's DQ summary). */
    def stageWithMetrics[T](name: String)(body: => T)(
        metrics: T => Option[String]): T = {
      val t0 = System.currentTimeMillis()
      try {
        val out = body
        write(StageReport(name, "SUCCESS", t0,
          System.currentTimeMillis() - t0, None, metrics(out)))
        out
      } catch {
        case e: Throwable =>
          write(StageReport(name, "FAILED", t0,
            System.currentTimeMillis() - t0,
            Some(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"),
            None))
          throw e
      }
    }

    private def write(r: StageReport): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/${r.stage}_$runDate.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write((r.toJson + "\n").getBytes("UTF-8")) finally out.close()
    }
  }
}
