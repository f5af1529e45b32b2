package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SetSimIndex contract (the IncrementalIndexSpec pattern):
  *  1. probe == the q149 inline form row-for-row (same frozen base-df
  *     order, same prunes, same verify arithmetic);
  *  2. append+probe == rebuild+probe as a MATCH SET (prefix postings
  *     differ under the frozen vs refreshed order by design — lossless
  *     candidate generation means the verified results may not);
  *  3. append is delta-proportional: the base postings files are not
  *     rewritten. */
class SetSimIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def root(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"setsim_$tag")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private lazy val grams = DedupQueries
    .hashedGramsOf(spark.read.parquet(s"$sf/documents.parquet"))
    .select("doc_id", "grams_h", "n_grams")
    .localCheckpoint(true)
  private lazy val base =
    grams.filter(substring(md5(col("doc_id").cast("string")), 1, 2) > "19")
  private lazy val delta =
    grams.filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= "19")

  test("probe equals the q149 inline form row-for-row") {
    val r = root("probe")
    SetSimIndex.build(base, r, tau = 0.5)
    val served = SetSimIndex.probe(spark, r, delta, tau = 0.5)
    val inline = graft.SparkEntry.queries("q149_setsim_incremental")(spark, sf)
    assert(served.exceptAll(inline).isEmpty && inline.exceptAll(served).isEmpty,
      "index-served pairs diverged from the inline q149 form")
    assert(served.count() > 0, "degenerate fixture: no pairs found at all")
  }

  test("append + probe finds the same matches as rebuild + probe") {
    // split the base in half; build on half A, append half B — then
    // compare against a fresh build over the full base. Postings differ
    // (frozen vs refreshed df order); the MATCH SET must not.
    val halves = base.withColumn("h",
      substring(md5(concat(col("doc_id").cast("string"), lit(":half"))), 1, 1))
    val baseA = halves.filter(col("h") <= "7").drop("h")
    val baseB = halves.filter(col("h") > "7").drop("h")
    val rInc = root("inc")
    SetSimIndex.build(baseA, rInc, tau = 0.5)
    SetSimIndex.append(spark, rInc, baseB, tau = 0.5)
    val rFull = root("full")
    SetSimIndex.build(base, rFull, tau = 0.5)
    val got = SetSimIndex.probe(spark, rInc, delta, tau = 0.5)
    val want = SetSimIndex.probe(spark, rFull, delta, tau = 0.5)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "append-maintained index found different matches than a rebuild")
  }

  test("append does not rewrite the base postings (delta-proportional)") {
    val r = root("files")
    SetSimIndex.build(base, r, tau = 0.5)
    def parquetFiles(sub: String): Set[String] =
      Option(new java.io.File(s"$r/$sub").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = parquetFiles("prefixes")
    val beforeDocs = parquetFiles("docs")
    SetSimIndex.append(spark, r, delta, tau = 0.5)
    assert(before.subsetOf(parquetFiles("prefixes")),
      "append rewrote existing prefix postings files")
    assert(beforeDocs.subsetOf(parquetFiles("docs")),
      "append rewrote existing doc gram files")
  }
}
