package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** JSONL + ORC interchange: round-trip fidelity, corrupt-line audit split,
  * and the scale properties (partition pruning on JSONL drops, predicate
  * pushdown surviving the ORC format switch). */
class CorpusIOSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val tmp = Files.createTempDirectory("corpusio").toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toString).toSeq.sorted

  test("documents round-trip parquet -> JSONL -> explicit-schema read exactly") {
    CorpusIO.writeJsonl(docs, s"$tmp/docs_jsonl")
    val (clean, corrupt) = CorpusIO.ingestJsonl(
      spark, s"$tmp/docs_jsonl", docSchema, s"$tmp/docs_staged")
    assert(corrupt.count() == 0, "round-trip produced corrupt rows")
    assert(sortedRows(clean) == sortedRows(docs))
  }

  test("malformed JSONL lines land in the audit stream, clean rows parse") {
    val dir = s"$tmp/mixed_jsonl"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}
        |this line is not json at all
        |{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}
        |{"doc_id": 3 "text": "missing comma"}
        |""".stripMargin)
    val (clean, corrupt) = CorpusIO.ingestJsonl(
      spark, dir, docSchema, s"$tmp/mixed_staged")
    assert(clean.count() == 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val bad = corrupt.collect().map(_.getAs[String](CorpusIO.CorruptCol))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json at all")))
    assert(bad.exists(_.contains("missing comma")))
  }

  test("a JSONL read must not already contain the corrupt column") {
    intercept[IllegalArgumentException] {
      CorpusIO.readJsonl(spark, tmp, StructType(Seq(
        StructField("_corrupt_record", StringType))))
    }
  }

  test("partitioned JSONL drop partition-prunes on the source predicate") {
    CorpusIO.writeJsonl(docs, s"$tmp/docs_jsonl_part", partitionCols = Seq("source"))
    val schemaNoSource = StructType(docSchema.fields.filterNot(_.name == "source"))
    val back = CorpusIO.readJsonl(spark, s"$tmp/docs_jsonl_part", schemaNoSource)
      .filter(col("source") === "src7")
    val expected = docs.filter(col("source") === "src7").count()
    assert(back.count() == expected && expected > 0)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(source"),
      s"source predicate did not partition-prune:\n$p")
  }

  test("documents round-trip ORC exactly; filters still push to the scan") {
    CorpusIO.writeOrc(docs, s"$tmp/docs_orc")
    val back = CorpusIO.readOrc(spark, s"$tmp/docs_orc")
    assert(sortedRows(back) == sortedRows(docs))
    val q = back.filter(col("n_chars") > 500).select("doc_id", "n_chars")
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(n_chars"),
      s"n_chars filter not pushed to the ORC scan:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"ORC scan read more columns than the projection needs:\n$p")
  }

  test("binary multimodal payloads round-trip ORC bit-exactly") {
    import spark.implicits._
    val bin = Seq((1L, Array[Byte](0, 1, 2, -1, 127, -128)),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    CorpusIO.writeOrc(bin, s"$tmp/bin_orc")
    val back = CorpusIO.readOrc(spark, s"$tmp/bin_orc")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back(1L) == Seq[Byte](0, 1, 2, -1, 127, -128))
    assert(back(2L) == Seq.empty[Byte])
  }
}
