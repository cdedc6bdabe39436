package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-suffix-list registered-domain extraction — the broadcast
  * suffix-table join [[UrlOps.registeredDomain]]'s doc names as the
  * correct replacement for its last-two-labels heuristic (wrong for
  * ccTLD registries: `bbc.co.uk` must yield `bbc.co.uk`, not `co.uk`).
  *
  * Algorithm (publicsuffix.org/list/ rules, public spec):
  *   - a rule matches a host when the host ends with the rule on label
  *     boundaries; `*` matches exactly one label; `!rule` is an
  *     exception whose public suffix is the rule minus its leftmost
  *     label;
  *   - the prevailing match is the exception if any, else the rule with
  *     the most labels, else the implicit default rule `*` (one label);
  *   - registered domain = prevailing public suffix plus one more
  *     label; hosts that ARE a public suffix (or single-label hosts
  *     under the default rule) have none → NULL.
  *
  * Scale shape (the 100 TB path): candidate label-suffixes are built
  * scan-side (≤ [[MaxLabels]] per host, no shuffle), the rule table is
  * `broadcast()` (the full PSL is ~9k rules ≈ 200 KB — always
  * broadcastable), the longest-match aggregation runs per DISTINCT
  * host (crawl corpora repeat hosts heavily, so this shuffle moves
  * domains, not documents), and the host→domain map joins back
  * broadcast. No sort-merge join, no cartesian, nothing driver-side.
  *
  * [[snapshotRules]] is a bounded offline snapshot of publicsuffix.org
  * entries (exercising plain, wildcard, and exception rule kinds); a
  * deployment swaps in the full downloaded list — same code path, the
  * rule count only changes the broadcast payload.
  */
object PublicSuffix {

  /** Hosts beyond this many labels only match rules within the last
    * MaxLabels labels — the real PSL's deepest rule has 5. */
  val MaxLabels = 6

  /** Bounded snapshot of publicsuffix.org entries, PSL syntax
    * (`rule`, `*.rule`, `!rule`). */
  val snapshotRules: Seq[String] = Seq(
    // gTLDs
    "com", "org", "net", "edu", "gov", "io", "co", "info", "biz",
    // ccTLDs with second-level registries
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "au", "com.au", "org.au", "net.au", "edu.au",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp",
    "nz", "co.nz", "org.nz", "net.nz",
    "in", "co.in", "org.in", "net.in",
    "za", "co.za", "org.za",
    "br", "com.br", "org.br", "net.br",
    "de", "fr", "nl", "it", "es",
    // wildcard registries (every direct child is a public suffix)
    "*.kawasaki.jp", "*.ck",
    // exceptions to the wildcards above
    "!city.kawasaki.jp", "!www.ck",
    // private-section entries (user-content platforms)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com")

  /** One PSL rule expanded to join form: the literal string candidate
    * suffixes are matched against (wildcards keep their `*.` — the
    * candidate side emits a starred key per suffix), the label count of
    * the public suffix a match implies, and exception precedence. */
  private final case class Rule(matchKey: String, psLabels: Int, isException: Boolean)

  private def expand(rule: String): Rule = {
    def nLabels(s: String) = s.count(_ == '.') + 1
    if (rule.startsWith("!")) {
      val r = rule.tail
      Rule(r, nLabels(r) - 1, isException = true)
    } else if (rule.startsWith("*.")) {
      // the star-matched label is part of the public suffix
      Rule(rule, nLabels(rule.stripPrefix("*.")) + 1, isException = false)
    } else Rule(rule, nLabels(rule), isException = false)
  }

  /** The broadcastable rule table: (match_key, ps_labels, is_exception). */
  def rulesDf(spark: SparkSession, rules: Seq[String] = snapshotRules): DataFrame = {
    import spark.implicits._
    rules.map(expand).map(r => (r.matchKey, r.psLabels, r.isException))
      .toDF("match_key", "ps_labels", "is_exception")
  }

  /** host → registered_domain mapping for every distinct non-empty host
    * in `hosts` (a one-column frame). NULL registered_domain where the
    * host is itself a public suffix or single-label. */
  def domainMap(spark: SparkSession, hosts: DataFrame,
      rules: Seq[String] = snapshotRules): DataFrame = {
    val hostCol = hosts.columns.head
    val distinctHosts = hosts.select(lower(col(hostCol)).as("host"))
      .filter(col("host") =!= "").distinct()

    val labels = split(col("host"), "\\.")
    // per host: every label-aligned suffix of ≤ MaxLabels labels, plus
    // its starred form (`a.co.uk` → `co.uk` also probes `*.co.uk`) —
    // built scan-side, ≤ 2·MaxLabels candidates per host
    val candidates = distinctHosts
      .withColumn("nl", size(labels))
      .withColumn("cand", explode(flatten(transform(
        sequence(lit(1), least(col("nl"), lit(MaxLabels))),
        k => {
          val suffix = array_join(slice(labels, -k, k), ".")
          val starred = when(k >= 2, concat(lit("*."),
            array_join(slice(labels, -(k - lit(1)), k - lit(1)), ".")))
          filter(array(suffix, starred), c => c.isNotNull)
        }))))

    // LEFT join: non-matching hosts keep a null rule row, so the
    // aggregation below covers EVERY host — no second join back to
    // recover the unmatched ones (that join was a sort-merge).
    val matched = candidates
      .join(broadcast(rulesDf(spark, rules)), col("cand") === col("match_key"), "left")
      .groupBy("host")
      .agg(
        max(when(col("is_exception"), col("ps_labels"))).as("exc_ps"),
        max(when(!col("is_exception"), col("ps_labels"))).as("std_ps"))

    // exception prevails; else longest match; else the default rule `*`
    val ps = coalesce(col("exc_ps"), col("std_ps"), lit(1))
    matched.select(col("host"),
      when(size(split(col("host"), "\\.")) > ps,
        array_join(slice(split(col("host"), "\\."), -(ps + lit(1)), ps + lit(1)), "."))
        .as("registered_domain"))
  }

  /** Append `host` (lowercased, port-stripped) and `registered_domain`
    * to `df`. The host→domain map is distinct-host-sized — NOT hinted:
    * a web-scale corpus has ~10⁸ distinct hosts, and a forced
    * `broadcast()` there OOMs the driver where a plain equi-join lets
    * AQE broadcast exactly when the measured map is actually small
    * (the q_redirected_dedup discipline, enforced by PlanShapeSpec's
    * registry-hint guard). */
  def withRegisteredDomain(spark: SparkSession, df: DataFrame, url: Column,
      rules: Seq[String] = snapshotRules): DataFrame = {
    // fail fast rather than silently overwrite caller data: both output
    // columns are appended by THIS function and must not pre-exist
    val clash = df.columns.toSet.intersect(Set("host", "registered_domain"))
    require(clash.isEmpty,
      s"withRegisteredDomain appends columns ${clash.mkString(", ")} that " +
        "already exist in the input frame; rename or drop them first")
    val withHost = df.withColumn("host", lower(UrlOps.hostNoPort(url)))
    withHost.join(
      domainMap(spark, withHost.select("host"), rules),
      Seq("host"), "left")
  }

  // ---- oracle generation ----------------------------------------------

  private def reEscape(s: String): String = s.replace(".", "\\.")

  /** DuckDB CASE chain computing the identical registered domain from a
    * host expression — generated from the SAME rule list the join uses,
    * so the Spark path and the oracle cannot drift. Branch order =
    * PSL precedence: exceptions, then rules by label count descending,
    * then the implicit default rule. */
  def oracleCaseSql(hostExpr: String, rules: Seq[String] = snapshotRules): String = {
    val h = s"lower($hostExpr)"
    val expanded = rules.map(r => (r, expand(r)))
    val exceptions = expanded.filter(_._2.isException)
    val standard = expanded.filterNot(_._2.isException)
      .sortBy { case (_, r) => -r.psLabels }

    val excBranches = exceptions.map { case (_, r) =>
      // regdomain under an exception is always the exception rule itself
      s"WHEN $h = '${r.matchKey}' OR $h LIKE '%.${r.matchKey}' THEN '${r.matchKey}'"
    }
    val stdBranches = standard.flatMap { case (raw, r) =>
      if (raw.startsWith("*.")) {
        val base = reEscape(raw.stripPrefix("*."))
        Seq(
          // host = <label>.<label>.<base> or deeper → last psLabels+1 labels
          s"WHEN regexp_extract($h, '([^.]+\\.[^.]+\\.$base)$$', 1) <> '' " +
            s"THEN regexp_extract($h, '([^.]+\\.[^.]+\\.$base)$$', 1)",
          // host IS the (star-matched) public suffix → no registered domain
          s"WHEN regexp_extract($h, '^[^.]+\\.$base$$', 0) <> '' THEN NULL")
      } else {
        val esc = reEscape(r.matchKey)
        Seq(
          s"WHEN regexp_extract($h, '([^.]+\\.$esc)$$', 1) <> '' " +
            s"THEN regexp_extract($h, '([^.]+\\.$esc)$$', 1)",
          s"WHEN $h = '${r.matchKey}' THEN NULL")
      }
    }
    val default =
      s"WHEN regexp_extract($h, '([^.]+\\.[^.]+)$$', 1) <> '' " +
        s"THEN regexp_extract($h, '([^.]+\\.[^.]+)$$', 1)"
    (excBranches ++ stdBranches :+ default)
      .mkString("CASE ", " ", " ELSE NULL END")
  }
}
