package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HtmlExtract.extract]] on handwritten adversarial markup — the q217
  * gate proves the synthetic-fixture path end-to-end; this pins the
  * extractor's behavior on the messy shapes real pages throw at it,
  * including the documented regex-extraction limits (a `>` inside an
  * attribute value and markup nested inside anchor text are out of
  * scope — asserted here so a future fix shows up as a spec update,
  * not a silent semantics change). */
class HtmlExtractSpec extends SparkSpec {

  private def run(html: String): (String, Long, Long) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h")).as("e"))
      .select("e.text", "e.n_lines_kept", "e.n_lines_dropped")
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("script bodies containing block markup never leak lines") {
    val (text, kept, dropped) = run(
      "<body><script>if (a < b) { document.write('<p>AD UNIT</p>') }" +
        "</script><p>real content line</p></body>")
    assert(text == "real content line" && kept == 1L && dropped == 0L)
  }

  test("style inside body is removed; head never contributes") {
    val (text, kept, _) = run(
      "<html><head><title>T</title><meta x=\"y\"></head>" +
        "<body><style>.x{content:'<div>no</div>'}</style>" +
        "<p>only this</p></body></html>")
    assert(text == "only this" && kept == 1L)
  }

  test("nested inline tags strip; <br> variants split lines") {
    val (text, kept, _) = run(
      "<p>He said <b>hi <i>there</i></b> ok</p>" +
        "<p>line a<br>line b<br/>line c</p>")
    assert(text == "He said hi there ok\nline a\nline b\nline c")
    assert(kept == 4L)
  }

  test("link density: >50% drops and is counted, exactly 50% keeps") {
    // "menu " (5 visible non-anchor chars) + 5-char anchor = exactly 50%
    val (text, kept, dropped) = run(
      "<p>menu <a href=\"/x\">items</a></p>" + // 10 visible, 5 anchor: keep
        "<p><a href=\"/a\">Home</a> <a href=\"/b\">About</a></p>" + // drop
        "<p>plain</p>")
    assert(text == "menu items\nplain")
    assert(kept == 2L && dropped == 1L)
  }

  test("entity unescape order: &amp;lt; decodes to &lt;, never twice") {
    val (text, _, _) = run(
      "<p>a &lt;tag&gt; &quot;q&quot; it&#39;s &amp; done &amp;lt;raw</p>")
    assert(text == "a <tag> \"q\" it's & done &lt;raw")
  }

  test("documented out-of-scope shapes hold their current behavior") {
    // '>' inside an attribute value truncates the tag strip (regex
    // extraction limit shared with every WET-style pipeline shortcut):
    // the residue after the quoted '>' survives as visible text.
    val (t1, _, _) = run("<p><span title=\"a > b\">x</span> y</p>")
    assert(t1 == "b\">x y", s"attribute-'>' behavior moved: '$t1'")
    // markup nested inside anchor TEXT counts its tag chars toward link
    // density (over-counts, biased toward dropping nav-like lines).
    val (t2, _, d2) = run("<p>word <a href=\"/\"><b>Go</b></a></p>")
    assert(t2 == "" && d2 == 1L,
      s"nested-anchor-markup behavior moved: '$t2' dropped=$d2")
  }

  test("whole-page composition matches hand-derived expectation") {
    val html =
      "<html><head><style>p{}</style></head><body>" +
        "<div><a href=\"/\">Nav1</a> <a href=\"/2\">Nav2</a></div>" +
        "<h1>Title Text</h1>" +
        "<p>first paragraph here</p>" +
        "<script>var x='<div>junk</div>';</script>" +
        "<p>second &amp; final</p>" +
        "<div><a href=\"/t\">Terms</a></div>" +
        "</body></html>"
    val (text, kept, dropped) = run(html)
    assert(text == "Title Text\nfirst paragraph here\nsecond & final")
    assert(kept == 3L && dropped == 2L)
  }
}
