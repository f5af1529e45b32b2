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
  *  - explicit default port stripped — `:443` only when the scheme is
  *    https, `:80` only when it is http (a NON-default port is a
  *    distinct origin and survives);
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
    // Strip ONLY the scheme's own default port: `:443` is default for
    // https and `:80` for http — but `https://h:80/` and `http://h:443/`
    // are non-default ports, i.e. genuinely distinct origins that must
    // NOT merge with the portless spelling (r9 stripped both ports
    // unconditionally; advisor-flagged).
    val host0 = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
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
    * key. Defined on canonicalize's output (scheme-prefixed, www-free;
    * DEFAULT ports stripped but non-default ports survive), so the
    * `:port` suffix is dropped here too — `a.com:8080` must group with
    * `a.com` or one host dodges the per-domain cap via port spellings
    * (advisor-flagged). The host capture also stops at `?`/`#` so a
    * root-path URL with a query can't leak its params into the key. */
  def domain(canonUrl: Column): Column =
    regexp_replace(
      regexp_extract(canonUrl, "^[a-zA-Z]+://([^/?#]+)", 1),
      ":[0-9]+$", "")

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
