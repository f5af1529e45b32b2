package graft.transform

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Schemas

/** Property-based invariants over randomized payment corpora (SURVEY §5):
  *  - dedup: output txn_ids unique; every kept row carries the max txn_ts
  *    of its id-group; output ⊆ input.
  *  - silver: output ⊆ bronze; all validation predicates hold on output.
  *  - audit: valid ∪ invalid partitions the input exactly.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact is not in the offline cache) — deterministic corpora.
  */
class PipelineProperties extends SparkSpec {
  import scala.jdk.CollectionConverters._

  /** Deterministic samples from a generator (seeded, no bridge needed). */
  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed")))
    }

  private val genRow: Gen[Seq[String]] = for {
    id <- Gen.chooseNum(0, 30).map(i => s"t$i") // small id space → collisions
    merchant <- Gen.oneOf("m_0001", " m_0002 ", "m_0003")
    user <- Gen.oneOf("u_000001", "", "u_000002")
    amount <- Gen.oneOf("10.00", "-3.50", "0.00", "junk", "999.99")
    currency <- Gen.oneOf("GBP", "usd", "ZZZ", "EUR")
    status <- Gen.oneOf("SETTLED", "settled", "PENDINGISH", "DECLINED")
    hour <- Gen.chooseNum(0, 23)
    day <- Gen.chooseNum(1, 28)
  } yield Seq(id, merchant, user, amount, currency, status,
    f"2025-08-$day%02dT$hour%02d:00:00", "GB")

  private val genCorpus: Gen[List[Seq[String]]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, genRow))

  private def df(rows: List[Seq[String]]) =
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, Schemas.raw)

  test("property: dedup keeps one row per txn_id, with the max txn_ts") {
    forAll(genCorpus, 10) { rows =>
      val bronze = Bronze.pipeline(df(rows)).cache()
      try {
        val collected = bronze.select("txn_id", "txn_ts").collect()
        val ids = collected.map(_.getString(0))
        assert(ids.distinct.length == ids.length, "txn_id not unique")
        // every kept ts is the max of its group in the normalised input
        val input = Bronze.deriveTxnDate(Bronze.normaliseStrings(
          Bronze.castDtypes(df(rows))))
          .select("txn_id", "txn_ts").collect()
          .filter(_.get(1) != null)
          .groupBy(_.getString(0))
          .view.mapValues(_.map(_.getTimestamp(1)).max).toMap
        collected.filter(_.get(1) != null).foreach { r =>
          assert(r.getTimestamp(1) == input(r.getString(0)),
            s"kept ts is not the max for ${r.getString(0)}")
        }
      } finally { bronze.unpersist(); () }
    }
  }

  test("property: silver output satisfies every validation predicate and ⊆ bronze") {
    forAll(genCorpus, 10) { rows =>
      val bronze = Bronze.pipeline(df(rows))
      val silver = Silver.pipeline(bronze).cache()
      try {
        val bad = silver.filter(
          "amount IS NULL OR amount <= 0" +
            s" OR currency NOT IN (${Schemas.validCurrencies.map(c => s"'$c'").mkString(",")})" +
            s" OR status NOT IN (${Schemas.validStatuses.map(c => s"'$c'").mkString(",")})" +
            " OR status_curated = 'UNKNOWN'").count()
        assert(bad == 0)
        assert(silver.count() <= bronze.count())
      } finally { silver.unpersist(); () }
    }
  }

  test("property: audit valid ∪ invalid = input, disjoint") {
    forAll(genCorpus, 10) { rows =>
      val bronze = Bronze.pipeline(df(rows)).cache()
      try {
        val tagged = Audit.tagRejects(bronze).cache()
        val nValid = Audit.validRecords(tagged).count()
        val nInvalid = Audit.invalidRecords(tagged).count()
        assert(nValid + nInvalid == bronze.count())
        assert(nValid == Silver.pipeline(bronze).count())
        tagged.unpersist()
      } finally { bronze.unpersist(); () }
    }
  }
}
