package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted ExactSubstr window-hash index: the stored-layout probe must
  * equal the inline incremental form row-for-row, append+probe must
  * equal rebuild+probe (content-pure hashing — no frozen-order drift),
  * and appended docs must serve later probes as standing corpus
  * immediately. */
class SubstrIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("q252 (persisted index) == q251 (inline incremental), row for row") {
    val got = rows(graft.SparkEntry.queries("q252_exact_substr_indexed")(spark, sf))
    val want = rows(graft.SparkEntry.queries("q251_exact_substr_incremental")(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("append+probe == rebuild+probe; appended docs serve immediately") {
    import spark.implicits._
    def doc(id: Long, toks: Seq[String]) =
      (id, toks.mkString(" "), "en", "src", 0L)
    val spine = (1 to 120).map(i => s"w$i")
    val batch1 = Seq(doc(0L, spine), doc(1L, (1 to 80).map(i => s"u$i")))
    val batch2 = Seq(doc(10L, (1 to 60).map(i => s"v$i")))
    // probe batch: copies a 70-token span of doc 0 (batch 1) and the
    // whole of doc 10 (batch 2) — detecting the latter proves appended
    // docs are standing corpus
    val probeDocs = Seq(
      doc(100L, (1 to 20).map(i => s"x$i") ++ spine.slice(10, 80)),
      doc(101L, (1 to 60).map(i => s"v$i")),
      doc(102L, (1 to 55).map(i => s"y$i")))
    def df(rs: Seq[(Long, String, String, String, Long)]) =
      rs.toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      SubstrIndex.build(df(batch1), "sxi_a")
      SubstrIndex.append(df(batch2), "sxi_a")
      SubstrIndex.build(df(batch1 ++ batch2), "sxi_b")
      // table contents equal as SETS (bucket file layout may differ)
      def windows(n: String): Set[String] =
        spark.table(s"${n}_windows").collect().map(_.toString).toSet
      assert(windows("sxi_a") == windows("sxi_b"),
        "append+build must equal rebuild, window for window")
      val corpus = df(batch1 ++ batch2)
      val viaAppend = rows(SubstrIndex.probe(spark, "sxi_a", df(probeDocs), corpus))
      val viaRebuild = rows(SubstrIndex.probe(spark, "sxi_b", df(probeDocs), corpus))
      assert(viaAppend == viaRebuild)
      assert(viaAppend(100L) == ((90L, 70L, 20L)),
        "the copied 70-token span must be covered exactly")
      assert(viaAppend(101L) == ((60L, 60L, 0L)),
        "a full copy of an APPENDED doc must be fully covered")
      assert(viaAppend(102L) == ((55L, 0L, 55L)), "unique doc kept whole")
    } finally {
      Seq("sxi_a_windows", "sxi_b_windows").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("probe contract: delta-vs-delta earlier occurrences are detected") {
    import spark.implicits._
    val base = Seq((0L, (1 to 60).map(i => s"b$i").mkString(" "), "en", "src", 0L))
    // two probe docs sharing a 60-token span absent from the index:
    // the later doc must be covered against the EARLIER delta doc
    val shared = (1 to 60).map(i => s"s$i")
    val delta = Seq(
      (100L, shared.mkString(" "), "en", "src", 0L),
      (101L, shared.mkString(" "), "en", "src", 0L))
    val bdf = base.toDF("doc_id", "text", "lang", "source", "n_chars")
    val ddf = delta.toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      SubstrIndex.build(bdf, "sxi_c")
      val got = rows(SubstrIndex.probe(spark, "sxi_c", ddf, bdf))
      assert(got(100L) == ((60L, 0L, 60L)), "first delta copy is kept")
      assert(got(101L) == ((60L, 60L, 0L)), "second delta copy is covered")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sxi_c_windows")
    }
  }
}
