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

  /** Crawl-policy URL filter — the robots.txt-shaped gate (RFC 9309
    * precedence) a compliant pipeline runs before fetching or keeping a
    * page: `rules` is a (host, path_prefix, allow) table; for each URL
    * the matching rule (same lowercased port-less host, rule prefix is
    * a byte prefix of the path) with the LONGEST prefix decides, an
    * equal-length tie prefers allow, and no matching rule — including
    * unknown hosts — defaults to allow. The empty path is matched as
    * "/" (the RFC's empty-Disallow convention).
    *
    * Scale shape: policy tables are registry-sized, so rules collapse
    * to ONE broadcast row per host (`collect_list` of (prefix, allow)
    * structs) and the decision is a scan-local array fold — the
    * max-by-(prefix-length, allow) reduction is order-independent, so
    * `collect_list`'s nondeterministic order is harmless. ZERO
    * shuffles on the URL stream at any corpus size. Output: input
    * columns + (host [lowercased, port-less], path [normalized],
    * rule_len [-1 = default], allowed). */
  def urlPolicy(df: org.apache.spark.sql.DataFrame, urlCol: String,
      rules: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(Set("host", "path_prefix", "allow")
      .subsetOf(rules.columns.toSet),
      s"rules needs (host, path_prefix, allow), got ${rules.columns.mkString(", ")}")
    val r = rules.select(lower(col("host")).as("__h"),
      struct(col("path_prefix").cast("string").as("p"),
        col("allow").cast("boolean").as("a")).as("__r"))
    val hostRules = r.groupBy("__h")
      .agg(collect_list(col("__r")).as("__rules"))
    df
      .withColumn("host", lower(hostNoPort(col(urlCol))))
      .withColumn("path",
        when(path(col(urlCol)) === "", lit("/"))
          .otherwise(path(col(urlCol))))
      .join(broadcast(hostRules), col("host") === col("__h"), "left")
      .withColumn("__best", aggregate(
        filter(coalesce(col("__rules"),
            array().cast("array<struct<p:string,a:boolean>>")),
          rl => col("path").substr(lit(1), length(rl.getField("p")))
            === rl.getField("p")),
        struct(lit(-1).cast("int").as("l"), lit(true).as("a")),
        (acc, rl) => {
          val l = length(rl.getField("p")).cast("int")
          val better = l > acc.getField("l") ||
            (l === acc.getField("l") && rl.getField("a") &&
              !acc.getField("a"))
          when(better, struct(l.as("l"), rl.getField("a").as("a")))
            .otherwise(acc)
        }))
      .withColumn("rule_len", col("__best.l"))
      .withColumn("allowed", col("__best.a"))
      .drop("__h", "__rules", "__best")
  }

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
