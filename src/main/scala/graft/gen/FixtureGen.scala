package graft.gen

import java.io.{BufferedWriter, File, FileWriter}
import java.time.LocalDate
import java.util.UUID
import scala.util.Random

/** Seeded synthetic payments-CSV generator — functional port of the
  * reference's local data generator
  * (`src/data_generator/generate_transaction_data.py`). Deterministic for a
  * given seed (JVM RNG, not byte-identical to the Python corpus — the golden
  * tests pin OUR seed-42 output).
  *
  * Behaviors ported:
  *  - G1 inclusive date range (`:78-83`)
  *  - G2 skewed amount sampler: 85% [1,80), 13% [80,400), 2% [400,2000] (`:86-94`)
  *  - G3 weighted status sampler: 30/40/5/2/15/5/2/1 (`:102-105`)
  *  - G4 fault injector: one of neg_amount / weird_currency / bad_status /
  *    blank_user with prob invalidRate (`:111-140`)
  *  - G5 seeded RNG (`:192-200`)
  * Output layout: `raw/transactions/ingest_date=YYYY-MM-DD/transactions_YYYY-MM-DD.csv`
  * with header (`:171-173`, `:207-208`).
  */
object FixtureGen {

  val Header = "txn_id,merchant_id,user_id,amount,currency,status,txn_ts,country"
  val Currencies = Vector("GBP", "USD", "EUR", "JPY", "AUD", "CAD")
  val Countries = Vector("GB", "FR", "DE", "ES", "IE", "NL", "IT", "JP", "AU", "CA")
  val Statuses = Vector("AUTHORISED", "SETTLED", "REFUNDED", "CHARGEBACK",
    "DECLINED", "PENDING", "SUCCESS", "FAILED")
  val StatusWeights = Vector(30, 40, 5, 2, 15, 5, 2, 1)
  val Faults = Vector("neg_amount", "weird_currency", "bad_status", "blank_user")

  final case class Config(
      startDate: LocalDate = LocalDate.parse("2025-08-01"),
      days: Int = 3,
      rowsPerDay: Int = 1000,
      invalidRate: Double = 0.02,
      seed: Long = 42L)

  private def weightedPick[A](rng: Random, items: Vector[A], weights: Vector[Int]): A = {
    val total = weights.sum
    var x = rng.nextInt(total)
    var i = 0
    while (x >= weights(i)) { x -= weights(i); i += 1 }
    items(i)
  }

  /** Skewed amount: 85% small, 13% mid, 2% large (reference `:86-94`). */
  private def sampleAmount(rng: Random): Double = {
    val r = rng.nextDouble()
    if (r < 0.85) 1.0 + rng.nextDouble() * 79.0
    else if (r < 0.98) 80.0 + rng.nextDouble() * 320.0
    else 400.0 + rng.nextDouble() * 1600.0
  }

  /** One CSV row (possibly fault-injected). */
  private def row(rng: Random, date: LocalDate, invalidRate: Double): String = {
    val txnId = new UUID(rng.nextLong(), rng.nextLong()).toString
    val merchant = f"m_${rng.nextInt(50) + 1}%04d"
    var user = f"u_${rng.nextInt(5000) + 1}%06d"
    // Locale.ROOT: a comma-decimal default locale would corrupt the CSV
    var amount = String.format(java.util.Locale.ROOT, "%.2f",
      Double.box(sampleAmount(rng)))
    var currency = Currencies(rng.nextInt(Currencies.size))
    var status = weightedPick(rng, Statuses, StatusWeights)
    val sec = rng.nextInt(86400)
    val ts = f"${date}T${sec / 3600}%02d:${(sec % 3600) / 60}%02d:${sec % 60}%02d"
    val country = Countries(rng.nextInt(Countries.size))
    if (rng.nextDouble() < invalidRate) {
      Faults(rng.nextInt(Faults.size)) match {
        case "neg_amount" => amount = "-" + amount
        case "weird_currency" => currency = "ZZZ"
        case "bad_status" => status = "PENDINGISH"
        case "blank_user" => user = ""
      }
    }
    s"$txnId,$merchant,$user,$amount,$currency,$status,$ts,$country"
  }

  /** Generate the full corpus under `rawRoot`; returns the day directories. */
  def generate(rawRoot: String, cfg: Config = Config()): Seq[File] = {
    val rng = new Random(cfg.seed)
    (0 until cfg.days).map { d =>
      val date = cfg.startDate.plusDays(d.toLong)
      val dir = new File(s"$rawRoot/transactions/ingest_date=$date")
      dir.mkdirs()
      val out = new File(dir, s"transactions_$date.csv")
      val w = new BufferedWriter(new FileWriter(out))
      try {
        w.write(Header); w.newLine()
        (0 until cfg.rowsPerDay).foreach { _ => w.write(row(rng, date, cfg.invalidRate)); w.newLine() }
      } finally w.close()
      dir
    }
  }

  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "target/fixtures/raw"
    val dirs = generate(root)
    println(s"wrote ${dirs.size} day partitions under $root")
  }
}
