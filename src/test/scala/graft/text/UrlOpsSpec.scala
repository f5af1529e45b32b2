package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UrlOps.canonicalize]] rule-by-rule on handwritten URLs — the q218
  * gate proves the composed fixture path; this pins each rule alone and
  * the edges the fixture never hits (root path, non-default port,
  * utm-only query, path case preservation). */
class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalize(col("u")))
      .collect().map(_.getString(0)).toSeq
  }

  test("host lowercases, path case is preserved") {
    assert(canon("https://EXAMPLE.org/Path/To/X") ==
      Seq("https://example.org/Path/To/X"))
  }

  test("www. strips only as a prefix label") {
    assert(canon("https://www.example.org/a",
      "https://wwwexample.org/a", "https://sub.www.example.org/a") ==
      Seq("https://example.org/a", "https://wwwexample.org/a",
        "https://sub.www.example.org/a"))
  }

  test("default ports strip; explicit non-default ports survive") {
    assert(canon("https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:8080/x") ==
      Seq("https://a.com/x", "http://a.com/x", "https://a.com:8080/x"))
  }

  test("port stripping is scheme-conditional: cross combos survive") {
    // https://h:80 and http://h:443 are NON-default ports — distinct
    // origins that must not merge with the portless spelling (the r9
    // unconditional `:(443|80)$` strip merged them; advisor-flagged)
    assert(canon("https://a.com:80/x", "http://a.com:443/x") ==
      Seq("https://a.com:80/x", "http://a.com:443/x"))
  }

  test("domain() is port-free and query-safe") {
    import spark.implicits._
    val got = Seq("https://a.com:8080/x", "https://a.com/x",
      "http://a.com:443/y", "https://b.org?id=1")
      .toDF("u")
      .select(UrlOps.domain(UrlOps.canonicalize(col("u"))))
      .collect().map(_.getString(0)).toSeq
    // a.com:8080 groups WITH a.com (no per-domain-cap dodge via port
    // spellings); a root-path URL's query never leaks into the key
    assert(got == Seq("a.com", "a.com", "a.com", "b.org"), got.toString)
  }

  test("fragment strips; trailing slash strips except on the root path") {
    assert(canon("https://a.com/x#sec", "https://a.com/x/",
      "https://a.com/") ==
      Seq("https://a.com/x", "https://a.com/x", "https://a.com/"))
  }

  test("utm params drop, survivors sort, empty query loses its '?'") {
    assert(canon(
      "https://a.com/x?ref=2&utm_source=f&id=1",
      "https://a.com/x?id=1&ref=2",
      "https://a.com/x?utm_campaign=c&utm_source=f") ==
      Seq("https://a.com/x?id=1&ref=2",
        "https://a.com/x?id=1&ref=2",
        "https://a.com/x"))
  }

  test("the designed variant axes all collapse to one class") {
    // every spelling of fixture class 12 (doc_ids 12, 52, 92, …)
    // canonicalizes identically — the q218 teeth, pinned directly
    import spark.implicits._
    val ids = (0L until 400L).filter(_ % 40 == 12)
    val got = ids.toDF("doc_id")
      .select(UrlOps.canonicalize(UrlOps.syntheticUrl(col("doc_id"))))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("https://site12.com/p/12?id=2&ref=12"), got.toString)
  }
}
