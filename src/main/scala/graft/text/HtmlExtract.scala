package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction from HTML markup — the WARC→WET layer every
  * web-scale corpus build starts with (Common Crawl WET, C4, RefinedWeb
  * all begin by stripping markup and dropping boilerplate before any
  * quality gate runs). Re-expressed Spark-first: the whole extractor is
  * a chain of codegen'd string expressions (regexp_replace + HOF
  * transforms over the line array) — a pure narrow map, zero shuffles,
  * the q103/q156 multimodal posture applied to markup instead of bytes.
  *
  * Pipeline (the classic jusText/trafilatura skeleton, deterministic):
  *  1. drop `<head>…</head>` wholesale (title/style/meta are not content);
  *  2. drop `<script>`/`<style>` elements INCLUDING their bodies — and
  *     before block splitting, so markup inside script text can't leak
  *     lines into the output;
  *  3. block-level closers (`</p> </div> </h*> </li> </tr>`, `<br>`)
  *     become newlines — the line spine boilerplate scoring needs;
  *  4. per line: strip remaining tags, measure LINK DENSITY = anchor-text
  *     chars / visible chars (computed from the raw line BEFORE
  *     stripping); a line past the threshold is navigation/footer/ad
  *     boilerplate (the jusText rule) and is dropped but COUNTED;
  *  5. unescape the core entities on kept lines (`&lt; &gt; &quot;
  *     &#39;` first, `&amp;` LAST so `&amp;lt;` can't double-decode).
  *
  * Everything is exact string arithmetic, so the q217 gate hash-compares
  * the extracted text against ground truth the oracle derives from the
  * GENERATING formula (the fixture wraps `documents.text` in synthetic
  * markup — [[syntheticHtml]] — so expected content is known without
  * parsing anything). HtmlExtractSpec drives the same extractor over
  * handwritten adversarial HTML (attributes containing `>`-lookalikes,
  * block markup inside script bodies, nested inline tags, mixed-case
  * tags are out of scope and documented).
  */
object HtmlExtract {

  /** Visible-line array of an HTML document: steps 1-3 above, split on
    * the synthesized newlines. Elements still carry inline tags. */
  def htmlLines(html: Column): Column = {
    val noHead = regexp_replace(html, "(?s)<head>.*?</head>", " ")
    val noScript = regexp_replace(noHead,
      "(?s)<(script|style)[^>]*>.*?</\\1>", " ")
    val broken = regexp_replace(noScript,
      "</(p|div|h[1-6]|li|tr)>|<br */?>", "\n")
    split(broken, "\n")
  }

  private def stripTags(l: Column): Column =
    trim(regexp_replace(l, "<[^>]*>", ""))

  /** Total anchor-text length of one raw line (chars inside
    * `<a …>…</a>`, tags excluded). */
  private def anchorLen(l: Column): Column =
    aggregate(
      regexp_extract_all(l, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(x))

  private def unescape(l: Column): Column = {
    val a = replace(l, lit("&lt;"), lit("<"))
    val b = replace(a, lit("&gt;"), lit(">"))
    val c = replace(b, lit("&quot;"), lit("\""))
    val d = replace(c, lit("&#39;"), lit("'"))
    replace(d, lit("&amp;"), lit("&"))
  }

  /** Extraction result as a struct column:
    * `(text, n_lines_kept, n_lines_dropped)` — `text` is the kept lines
    * newline-joined and entity-unescaped; `n_lines_dropped` counts
    * NONEMPTY lines rejected by the link-density rule (pure markup
    * residue lines are neither kept nor counted). A line is kept when
    * `2·anchor_len <= visible_len` (≤50% link density). */
  def extract(html: Column): Column = {
    val scored = transform(htmlLines(html), l =>
      struct(stripTags(l).as("stripped"), anchorLen(l).as("alen")))
    val visible = filter(scored, s => length(s("stripped")) > 0)
    val kept = filter(visible,
      s => s("alen") * 2 <= length(s("stripped")))
    struct(
      array_join(transform(kept, s => unescape(s("stripped"))), "\n")
        .as("text"),
      size(kept).cast("long").as("n_lines_kept"),
      (size(visible) - size(kept)).cast("long").as("n_lines_dropped"))
  }

  /** Deterministic markup fixture for the q217 gate (the buildPayload
    * posture: the corpus has no HTML column, so the query synthesizes a
    * page from `(doc_id, text)` and the oracle derives expected content
    * from the same formula WITHOUT parsing). Content = the doc's words
    * re-lined 10 per `<p>` block plus one entity-bearing line; the
    * boilerplate is a nav bar, an odd-doc ad line (link density 70%), a
    * script whose BODY contains block markup (leak detector), and a
    * pure-link footer. */
  def syntheticHtml(id: Column, text: Column): Column = {
    val words = split(text, " ")
    val nch = greatest(ceil(size(words) / lit(10.0)).cast("int"), lit(1))
    val chunks = transform(sequence(lit(0), nch - 1),
      i => array_join(slice(words, i * 10 + 1, lit(10)), " "))
    val paras = concat(lit("<p>"), array_join(chunks, "</p><p>"),
      lit("</p>"))
    concat(
      lit("<html><head><title>doc "), id,
      lit("</title><style>p{color:#333}</style></head><body>"),
      lit("<div><a href=\"/\">Home</a> <a href=\"/about\">About</a></div>"),
      paras,
      when(id % 2 === 1,
        lit("<p>Buy <a href=\"/buy\">cheap tokens now at example dot com</a></p>"))
        .otherwise(lit("")),
      lit("<script>var x = '<p>not content</p>';</script>"),
      lit("<p>Tom &amp; Jerry &lt;3 &gt;&gt; &quot;ok&quot;</p>"),
      lit("<div><a href=\"/tos\">Terms</a><a href=\"/priv\">Privacy</a></div>"),
      lit("</body></html>"))
  }
}
