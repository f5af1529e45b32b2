package graft.transform

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DecimalType, StringType, TimestampType, DateType}

import graft.SparkSpec
import graft.model.Schemas

class BronzeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def rawDf(rows: Seq[Seq[String]]) =
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, Schemas.raw)

  private val valid = Seq("t1", "m_0001", "u_000001", "12.34", "GBP",
    "SETTLED", "2025-08-01T10:00:00", "GB")

  test("castDtypes: amount → Decimal(12,2), txn_ts → timestamp") {
    val out = Bronze.castDtypes(rawDf(Seq(valid)))
    assert(out.schema("amount").dataType == DecimalType(12, 2))
    assert(out.schema("txn_ts").dataType == TimestampType)
    val row = out.collect().head
    assert(row.getDecimal(3).toString == "12.34")
  }

  test("castDtypes: unparseable values become NULL (cast-to-null under ANSI)") {
    val out = Bronze.castDtypes(rawDf(Seq(
      valid.updated(0, "t2").updated(3, "notanumber").updated(6, "garbage"))))
    val row = out.collect().head
    assert(row.isNullAt(3) && row.isNullAt(6))
  }

  test("normaliseStrings trims and uppercases every string column (B1 fix)") {
    val out = Bronze.normaliseStrings(rawDf(Seq(
      valid.updated(1, "  m_0002 ").updated(4, "gbp").updated(5, " settled"))))
    val row = out.collect().head
    assert(row.getString(1) == "M_0002")
    assert(row.getString(4) == "GBP")
    assert(row.getString(5) == "SETTLED")
  }

  test("normaliseStrings leaves non-string columns untouched") {
    val typed = Bronze.castDtypes(rawDf(Seq(valid)))
    val out = Bronze.normaliseStrings(typed)
    assert(out.schema("amount").dataType == DecimalType(12, 2))
    assert(out.collect().head.getDecimal(3).toString == "12.34")
  }

  test("deduplicate keeps exactly the latest record per txn_id") {
    val out = Bronze.deduplicate(Bronze.castDtypes(rawDf(Seq(
      valid, // 10:00
      valid.updated(6, "2025-08-01T12:00:00").updated(3, "99.99"), // latest
      valid.updated(6, "2025-08-01T11:00:00"),
      valid.updated(0, "t9") // different key survives
    ))))
    assert(out.count() == 2)
    val t1 = out.filter("txn_id = 't1'").collect().head
    assert(t1.getDecimal(3).toString == "99.99")
  }

  test("deduplicate breaks txn_ts ties deterministically (B3)") {
    val dup = Seq(
      valid.updated(3, "1.00"),
      valid.updated(3, "2.00")) // same txn_id + txn_ts, different amount
    val outs = (1 to 5).map { _ =>
      Bronze.deduplicate(Bronze.castDtypes(rawDf(dup)))
        .collect().head.getDecimal(3).toString
    }
    assert(outs.distinct.size == 1, s"nondeterministic tiebreak: $outs")
  }

  test("deriveTxnDate adds txn_date = to_date(txn_ts)") {
    val out = Bronze.deriveTxnDate(Bronze.castDtypes(rawDf(Seq(valid))))
    assert(out.schema("txn_date").dataType == DateType)
    assert(out.collect().head.getDate(8).toString == "2025-08-01")
  }

  test("pipeline output matches the bronze schema contract") {
    val out = Bronze.pipeline(rawDf(Seq(valid)))
    assert(out.schema == Schemas.bronze)
  }

  test("schema-discovery read (crawler stand-in) agrees with the contract read on seed-42") {
    import org.apache.spark.sql.functions.{col, expr, sum}
    val root = java.nio.file.Files.createTempDirectory("graft-infer").toString
    val zones = graft.io.Zones(root)
    graft.gen.FixtureGen.generate(zones.raw.stripSuffix("/transactions"))
    val contract = zones.readRaw(spark)
    val inferred = zones.readRawInferred(spark)
    // discovery finds the same 8 logical columns and the same rows
    assert(inferred.columns.toSeq == contract.columns.toSeq)
    assert(inferred.count() == contract.count())
    assert(inferred.select(col("txn_id").cast("string"))
      .except(contract.select("txn_id")).count() == 0)
    // numeric agreement regardless of what type inference chose for amount
    val Seq(si, sc) = Seq(inferred, contract).map(
      _.agg(sum(expr("try_cast(amount AS double)"))).collect().head.getDouble(0))
    assert(math.abs(si - sc) < 1e-6, s"inferred=$si contract=$sc")
  }

  test("typed bronze boundary: Dataset[Transaction] round-trips") {
    val ds = Bronze.typed(Bronze.pipeline(rawDf(Seq(valid))))
    val t = ds.collect().head
    assert(t.txn_id == "T1" && t.currency == "GBP")
    assert(t.amount.compareTo(new java.math.BigDecimal("12.34")) == 0)
    assert(t.txn_date.toString == "2025-08-01")
  }
}
