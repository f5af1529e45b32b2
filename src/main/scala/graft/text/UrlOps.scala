package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — crawl dedup's step ZERO: before any content
  * hash runs, the fetch frontier and the dedup ledger both key on a
  * canonical URL, and every real crawl carries the same page under
  * dozens of surface spellings (case-shifted hosts, `www.` prefixes,
  * explicit default ports, tracking params, fragments, trailing
  * slashes). Canonicalization is a pure narrow string map — the
  * cheapest dedup this catalog has, and the one that must run first
  * because it needs no shuffle at all until the ledger join.
  *
  * Rules (the common-crawl-style conservative set, each one a spec row):
  *  - scheme + host lowercase; leading `www.` stripped;
  *  - explicit default port (`:443` for https) stripped;
  *  - fragment stripped (client-side only, never reaches the server);
  *  - tracking params (`utm_*`) dropped; surviving params SORTED so
  *    param order can't split a dedup class;
  *  - trailing slash stripped from non-root paths.
  * Deliberately NOT done (documented): `%`-escape normalization and
  * punycode/IDN folding (table-driven, out of scope), non-`utm_`
  * tracker lists (site-specific policy).
  *
  * Everything is codegen'd string expressions (`regexp_extract`, HOF
  * filter/sort over the split param array) — whole-stage codegen, zero
  * exchanges. */
object UrlOps {

  /** Canonical form of an absolute http(s) URL column. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z]+)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]+)", 1))
    val host0 = regexp_replace(hostPort, ":(443|80)$", "")
    val host = regexp_replace(host0, "^www\\.", "")
    val path0 = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    val path = when(length(path0) > 1,
      regexp_replace(path0, "/$", "")).otherwise(path0)
    val rawQ = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQ, "&"),
      p => !p.startsWith("utm_") && length(p) > 0))
    val query = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Registered host of a CANONICAL url — the q219/WebCurate grouping
    * key. Defined on canonicalize's output (scheme-prefixed, port- and
    * www-free), so one definition serves every consumer. */
  def domain(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-zA-Z]+://([^/]+)", 1)

  /** Deterministic messy-URL fixture for the q218 gate (the
    * syntheticHtml/buildPayload posture): the canonical target is a pure
    * function of `doc_id % 40` (domain, tld, path and both surviving
    * params all divide 40), while FOUR independent surface-variant axes
    * (`www.` by %3, uppercase host by %5 — constant within a class, so
    * classes of both casings exist — port by %7, fragment by %6, utm
    * param + param order by %9) spread each class across many raw
    * spellings. The oracle derives the canonical and the class size
    * from the formula WITHOUT parsing anything. */
  def syntheticUrl(id: Column): Column = {
    val host = concat(
      when(id % 3 === 0, lit("www.")).otherwise(lit("")),
      lit("site"), (id % 40).cast("string"),
      when(id % 2 === 0, lit(".com")).otherwise(lit(".org")))
    val hostCased = when(id % 5 === 0, upper(host)).otherwise(host)
    val idp = concat(lit("id="), (id % 10).cast("string"))
    val refp = concat(lit("ref="), (id % 20).cast("string"))
    val utm = lit("utm_source=feed")
    val query = when(id % 9 < 3, concat(idp, lit("&"), refp))
      .when(id % 9 < 6, concat(refp, lit("&"), utm, lit("&"), idp))
      .otherwise(concat(utm, lit("&"), idp, lit("&"), refp))
    concat(lit("https://"), hostCased,
      when(id % 7 === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), (id % 20).cast("string"),
      when(id % 4 === 0, lit("/")).otherwise(lit("")),
      lit("?"), query,
      when(id % 6 === 0, lit("#sec")).otherwise(lit("")))
  }
}
