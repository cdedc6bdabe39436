package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL handling for crawl curation: host/path extraction, the
  * registered-domain heuristic behind per-domain quotas
  * ([[graft.operators.Scale.groupQuota]] / `headCapSample`'s natural
  * grouping key), canonicalization for URL-keyed dedup, and tracking-
  * parameter removal.
  *
  * Everything is a regexp/string chain over RE2-SAFE patterns (no
  * lookahead, no backreferences in patterns) so the DuckDB oracle runs
  * the identical expressions — the same portability contract as
  * `TextAnalysis.stripHtml`. Deliberately NOT `parse_url`: Spark's is
  * Java-`URI`-backed with no DuckDB twin, and the subset a curation
  * pipeline needs (host, path, query) is three anchored extracts.
  * Every function is a scan-local projection inside whole-stage
  * codegen — zero shuffle at any scale.
  *
  * `registeredDomain` here is the cheap last-two-labels heuristic —
  * scan-local, zero shuffle, but wrong for ccTLD registries like
  * `.co.uk`. The correct path is [[PublicSuffix.withRegisteredDomain]]:
  * the publicsuffix.org longest-match algorithm as a broadcast
  * suffix-rule join. Remaining non-goals: no IDN/punycode handling;
  * fragment-less URLs assumed for the final tracking-param form (RE2
  * has no lookahead, so the `#`-preserving branch is a capture of the
  * terminator).
  */
object UrlOps {

  private val SchemeHost = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)"

  /** Scheme ("https"), empty string when the input isn't a URL. */
  def scheme(url: Column): Column = regexp_extract(url, SchemeHost, 1)

  /** Host (authority) — "sub.example.com:8080" keeps its port;
    * [[hostNoPort]] drops it. Empty string for non-URLs. */
  def host(url: Column): Column = regexp_extract(url, SchemeHost, 2)

  def hostNoPort(url: Column): Column =
    regexp_replace(host(url), ":[0-9]+$", "")

  /** Path component ("" for bare domains, "/a/b" otherwise). */
  def path(url: Column): Column =
    regexp_extract(url, SchemeHost + "([^?#]*)", 3)

  /** Query string WITHOUT the '?', empty when absent. */
  def queryString(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Number of non-empty path segments: "/a/b/" → 2, "" → 0. */
  def pathDepth(url: Column): Column =
    size(filter(split(path(url), "/"), s => length(s) > 0))

  /** Last-two-labels registered domain ("a.b.example.com" →
    * "example.com"); single-label hosts ("localhost") pass through.
    * Port is stripped first. See the object doc for the PSL caveat. */
  def registeredDomain(url: Column): Column = {
    val h = hostNoPort(url)
    when(h.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(h, "([^.]+\\.[^.]+)$", 1)).otherwise(h)
  }

  /** Canonical dedup key: lowercase scheme://host + path with the
    * trailing slash trimmed, query and fragment dropped. The standard
    * URL-keyed exact-dedup move — "http://Example.com/a/" and
    * "http://example.com/a?utm_source=x" collapse to one key. Non-URLs
    * canonicalize to the empty string (filter them first). */
  def canonical(url: Column): Column =
    when(host(url) === "", lit(""))
      .otherwise(concat(lower(scheme(url)), lit("://"),
        lower(host(url)),
        regexp_replace(path(url), "/+$", "")))

  /** Tracking-parameter prefixes stripped by [[stripTracking]] —
    * mirrored verbatim in the oracle. */
  val trackingPrefixes: Seq[String] = Seq("utm_", "gclid", "fbclid")

  /** Remove utm_* / gclid / fbclid query parameters while preserving the
    * rest of the query string, in three RE2-safe passes:
    *  1. drop `&tracking=...` (non-leading params),
    *  2. promote the param after a leading `?tracking=...&` to `?`,
    *  3. drop a now-lone `?tracking=...` (capturing the `#`-or-end
    *     terminator, since RE2 has no lookahead). */
  def stripTracking(url: Column): Column = {
    val alt = trackingPrefixes.mkString("(?:", "|", ")")
    val s1 = regexp_replace(url, s"&$alt[^&#]*", "")
    val s2 = regexp_replace(s1, s"\\?$alt[^&#]*&", "?")
    regexp_replace(s2, s"\\?$alt[^&#]*(#|$$)", "$1")
  }
}
