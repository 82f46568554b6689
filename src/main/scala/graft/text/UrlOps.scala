package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-page dedup — the WARC-refetch primitive:
  * the same page is typically fetched many times under URL variants that
  * differ only in case, default ports, tracking parameters, parameter
  * order, fragments, or a trailing slash. Canonicalizing before the
  * content pass removes the cheapest (and at Common-Crawl scale, largest)
  * duplicate class with a per-row projection — no shuffle, no signatures.
  *
  * Built entirely from Spark SQL built-in functions (regexp + array
  * higher-order functions), so the whole chain stays native Catalyst
  * expressions — no UDF, usable in any projection and fully pushdown- and
  * codegen-friendly around it. The same semantics are recomputed
  * independently by the DuckDB oracle for `q_url_canonical` /
  * `q_url_dup_groups` (SparkEntry.oracleSql).
  *
  * Canonical form, applied in order:
  *   0. percent-encoding normalized (graft.expr.UrlPctNormalize — a
  *      native single-pass expression: unreserved `%XY` decoded, all
  *      other hex uppercased; applied first because decoding unreserved
  *      octets can never introduce a delimiter). The session must have
  *      the function registered (UrlPctNormalize.register /
  *      spark.sql.extensions=graft.expr.GraftExtensions).
  *   1. scheme and host (authority) lowercased
  *   2. default ports stripped (`:443` for https, `:80` for http)
  *   3. fragment dropped
  *   4. tracking params dropped: `utm_*`, `fbclid`, `gclid`, `msclkid`,
  *      `ref`, `mc_eid` (case-sensitive key match before the first `=`)
  *   5. remaining params byte-sorted (stable across fetches that permute)
  *   6. trailing slashes stripped from the path (`/a/` == `/a`; a bare
  *      root `/` canonicalizes to the empty path)
  *   7. `?` dropped when no params survive
  */
object UrlOps {

  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)(=.*)?$"

  /** Canonical URL as a Column expression over a string URL column. */
  def canonicalUrl(rawUrl: Column): Column = {
    val url = call_function(graft.expr.UrlPctNormalize.name, rawUrl)
    // authority = scheme://host[:port] (everything before path/query/frag)
    val rawAuth = regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val authLower = lower(rawAuth)
    val authNoPort = regexp_replace(
      regexp_replace(authLower, "^(https://[^/?#:]*):443$", "$1"),
      "^(http://[^/?#:]*):80$", "$1")
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val path = regexp_extract(rest, "^([^?#]*)", 1)
    val pathCanon = regexp_replace(path, "/+$", "")
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val sortedQ = array_join(sort_array(params), "&")
    val queryCanon = when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))
    concat(authNoPort, pathCanon, queryCanon)
  }

  /** Registered-domain-ish host grouping key: the lowercased host with any
    * leading `www.` dropped — the per-domain skew axis for web corpora
    * (candidate caps, crawl politeness, boilerplate analysis all group on
    * it). Port and userinfo are stripped with the authority regexes above.
    */
  def hostOf(url: Column): Column = {
    val host = regexp_extract(lower(url),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    regexp_replace(host, "^www\\.", "")
  }
}
