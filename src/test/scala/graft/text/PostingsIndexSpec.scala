package graft.text

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted postings index must rank bit-identically to the q86
  * scan path (same micro-unit arithmetic), prune its scan to the query
  * terms, and answer repeated probes deterministically. */
class PostingsIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-postings").toString
    PostingsIndex.build(
      spark.read.parquet(s"$sf/documents.parquet"), r)
    r
  }

  test("probe == q86 scan path, row for row") {
    val probe = PostingsIndex.probe(spark, root, Seq("query", "dup", "scan"))
      .collect().map(_.toString).toSeq
    val scan = graft.SparkEntry.queries("q86_bm25")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(probe == scan,
      s"index ranking diverged from the scan path:\n$probe\nvs\n$scan")
  }

  test("the term filter pushes into the postings parquet scan") {
    val p = PostingsIndex.probe(spark, root, Seq("query", "dup", "scan"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters: [In(tok"),
      s"term filter not pushed to the postings scan:\n$p")
  }

  test("repeated probes are deterministic; disjoint terms return empty") {
    val a = PostingsIndex.probe(spark, root, Seq("query")).collect().toSeq
    val b = PostingsIndex.probe(spark, root, Seq("query")).collect().toSeq
    assert(a == b, "probe result changed between runs")
    assert(PostingsIndex.probe(spark, root, Seq("zzz_not_a_term"))
      .collect().isEmpty)
  }

  test("index tables cover the corpus exactly (no token lost in the build)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val directTokens = docs.select(explode(filter(split(col("text"), " "),
        (x: org.apache.spark.sql.Column) => length(x) > lit(0))).as("tok"))
      .count()
    val indexed = spark.read.parquet(s"$root/postings")
      .agg(sum("tf")).collect()(0).getLong(0)
    val corpusRow = spark.read.parquet(s"$root/corpus").collect()(0)
    assert(indexed == directTokens, "postings tf mass != corpus tokens")
    assert(corpusRow.getAs[Long]("t_toks") == directTokens)
  }
}
