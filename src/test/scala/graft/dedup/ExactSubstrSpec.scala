package graft.dedup

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q249 ExactSubstr span dedup (VERDICT r11 punch #6): the pigeonhole
  * candidate bound + rolling-hash windows + relational run verification
  * must reproduce the BRUTE window semantics exactly — a position is
  * duplicated iff some 50-token window containing it occurs earlier in
  * the corpus ((doc_id, pos) order). Pinned on the real sf0.001 corpus
  * AND on adversarial fixtures: overlapping spans, a span repeated
  * WITHIN one doc, periodic text (the a==b chain regime), an exact
  * full-doc duplicate, and the 49-token near-miss that must NOT dedup. */
class ExactSubstrSpec extends SparkSpec {

  /** Reference semantics, computed the brute way (all 50-grams). */
  private def bruteCoverage(
      docs: Seq[(Long, Vector[String])]): Map[Long, Set[Int]] = {
    val first = scala.collection.mutable.HashSet[String]()
    val cov = scala.collection.mutable.HashMap[Long, Set[Int]]()
    for ((id, tk) <- docs.sortBy(_._1); i <- 1 to tk.length - 49) {
      val g = tk.slice(i - 1, i + 49).mkString(" ")
      if (!first.add(g))
        cov(id) = cov.getOrElse(id, Set.empty) ++ (i until i + 50)
    }
    cov.toMap
  }

  private def runQ249(dir: String): Map[Long, (Long, Long)] =
    graft.SparkEntry.queries("q249_exact_substr")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("q249 matches the brute window semantics on the sf0.001 corpus") {
    val docs = graft.analytics.Ops.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toVector)).toSeq
    val cov = bruteCoverage(docs)
    val got = runQ249("/root/testdata/sf0.001")
    assert(got.size == docs.size)
    docs.foreach { case (id, tk) =>
      val (nTok, nDup) = got(id)
      assert(nTok == tk.length.toLong, s"doc $id n_tokens")
      assert(nDup == cov.getOrElse(id, Set.empty).size.toLong,
        s"doc $id n_dup_tokens: got $nDup want ${cov.getOrElse(id, Set.empty).size}")
    }
    // the corpus genuinely exercises the operator (15 dup docs at sf0.001)
    assert(cov.nonEmpty, "sf0.001 has no duplicated spans — fixture premise broke")
  }

  test("adversarial: overlap, within-doc repeat, periodic, 49-token near-miss") {
    import spark.implicits._
    def w(prefix: String, n: Int): Vector[String] =
      (1 to n).map(i => s"$prefix$i").toVector
    val base = w("a", 120)                       // docA: all-unique spine
    val docB = w("b", 20) ++ base.slice(10, 80) ++ w("c", 20) // 70-token copy
    val docC = w("d", 30) ++ base.slice(10, 59) ++ w("e", 30) // 49-token: keep
    val blockX = w("x", 60)
    val docD = blockX ++ w("f", 10) ++ blockX    // within-doc repeat
    val docE = Vector.fill(120)("p")             // periodic (a==b chains)
    val docF = base                              // exact dup of docA
    val docG = w("g", 30)                        // shorter than the window
    val fixture = Seq(
      0L -> base, 1L -> docB, 2L -> docC, 3L -> docD, 4L -> docE,
      5L -> docF, 6L -> docG)
    val dir = Files.createTempDirectory("graft-exactsubstr").toString
    fixture.map { case (id, tk) => (id, tk.mkString(" "), "en", "src", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cov = bruteCoverage(fixture)
    val got = runQ249(dir)
    fixture.foreach { case (id, tk) =>
      assert(got(id) == (tk.length.toLong,
        cov.getOrElse(id, Set.empty).size.toLong), s"doc $id")
    }
    // hand-derived pins (the brute replica must agree with THESE too):
    assert(cov.getOrElse(0L, Set.empty).isEmpty, "docA is first — kept whole")
    assert(cov(1L).size == 70, "docB: exactly the 70 copied positions")
    assert(!cov.contains(2L), "docC: 49-token overlap is below the window")
    assert(cov(3L) == (71 to 130).toSet, "docD: the SECOND in-doc copy only")
    // docE periodic: every position from 2 on is inside a repeated window
    assert(cov(4L) == (2 to 120).toSet, "docE periodic coverage")
    assert(cov(5L).size == 120, "docF exact dup: fully covered")
    assert(!cov.contains(6L), "docG shorter than 50 — no window exists")
  }

  test("tokenization ignores empty tokens (doubled spaces)") {
    import spark.implicits._
    // 60 shared tokens written with a doubled space in one copy: the
    // filter(len>0) contract makes both docs identical token streams
    val toks = (1 to 60).map(i => s"t$i")
    val dir = Files.createTempDirectory("graft-exactsubstr2").toString
    Seq(
      (0L, toks.mkString(" "), "en", "src", 0L),
      (1L, toks.take(30).mkString(" ") + "  " + toks.drop(30).mkString(" "),
        "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = runQ249(dir)
    assert(got(0L) == (60L, 0L))
    assert(got(1L) == (60L, 60L), "doubled space must not break the match")
  }

  test("q251 incremental matches the brute base-first ordering on sf0.001") {
    // incremental "earlier": ALL base docs precede all delta docs, then
    // delta by (doc_id, pos) — the q149 md5 split plays the new batch
    def isDelta(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x" <= "19"
    }
    val docs = graft.analytics.Ops.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toVector)).toSeq
    val first = scala.collection.mutable.HashSet[String]()
    val cov = scala.collection.mutable.HashMap[Long, Set[Int]]()
    for ((id, tk) <- docs.sortBy { case (id, _) => (isDelta(id), id) };
         i <- 1 to tk.length - 49) {
      val g = tk.slice(i - 1, i + 49).mkString(" ")
      if (!first.add(g) && isDelta(id))
        cov(id) = cov.getOrElse(id, Set.empty) ++ (i until i + 50)
    }
    val got = graft.SparkEntry.queries("q251_exact_substr_incremental")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val delta = docs.filter { case (id, _) => isDelta(id) }
    assert(got.size == delta.size, "one output row per DELTA doc only")
    delta.foreach { case (id, tk) =>
      assert(got(id) == (tk.length.toLong,
        cov.getOrElse(id, Set.empty).size.toLong), s"doc $id")
    }
    // a base doc duplicated by a LATER base doc stays out of the output,
    // and base sources mark delta positions even at higher numeric ids
    assert(got.keySet.forall(isDelta))
  }
}
