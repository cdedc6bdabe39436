package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(Tuple1(url)).toDF("u").select(c(col("u"))).head.get(0)

  test("host/path/query split on the standard shapes") {
    val u = "https://a.b.Example.com:8080/x/y/doc.html?id=1&z=2#frag"
    assert(eval(u, UrlOps.scheme) === "https")
    assert(eval(u, UrlOps.host) === "a.b.Example.com:8080")
    assert(eval(u, UrlOps.hostNoPort) === "a.b.Example.com")
    assert(eval(u, UrlOps.path) === "/x/y/doc.html")
    assert(eval(u, UrlOps.queryString) === "id=1&z=2")
    assert(eval(u, UrlOps.pathDepth) === 3)
  }

  test("bare domain: empty path, depth 0, empty query") {
    val u = "http://example.com"
    assert(eval(u, UrlOps.path) === "")
    assert(eval(u, UrlOps.pathDepth) === 0)
    assert(eval(u, UrlOps.queryString) === "")
    assert(eval(u, UrlOps.canonical) === "http://example.com")
  }

  test("registeredDomain: last two labels; single-label and port handled") {
    assert(eval("https://a.b.example.com/", UrlOps.registeredDomain) === "example.com")
    assert(eval("https://example.com/", UrlOps.registeredDomain) === "example.com")
    assert(eval("http://localhost:9090/x", UrlOps.registeredDomain) === "localhost")
  }

  test("canonical: lowercases scheme+host, trims trailing slashes, drops query/fragment") {
    assert(eval("HTTP://Example.COM/A/B/?utm_source=x#f", UrlOps.canonical)
      === "http://example.com/A/B") // path CASE is significant on most servers — preserved
    assert(eval("https://example.com///", UrlOps.canonical) === "https://example.com")
    assert(eval("not a url", UrlOps.canonical) === "")
  }

  test("stripTracking: leading, middle, trailing, and lone tracking params") {
    assert(eval("https://e.com/p?utm_source=a&id=1", UrlOps.stripTracking)
      === "https://e.com/p?id=1")
    assert(eval("https://e.com/p?id=1&utm_source=a&z=2", UrlOps.stripTracking)
      === "https://e.com/p?id=1&z=2")
    assert(eval("https://e.com/p?id=1&gclid=xyz", UrlOps.stripTracking)
      === "https://e.com/p?id=1")
    assert(eval("https://e.com/p?fbclid=k", UrlOps.stripTracking)
      === "https://e.com/p")
    assert(eval("https://e.com/p?utm_a=1&utm_b=2", UrlOps.stripTracking)
      === "https://e.com/p")
    // fragment survives a lone tracking param (the captured terminator)
    assert(eval("https://e.com/p?utm_a=1#sec", UrlOps.stripTracking)
      === "https://e.com/p#sec")
    // non-tracking params are untouched
    assert(eval("https://e.com/p?id=1&z=2", UrlOps.stripTracking)
      === "https://e.com/p?id=1&z=2")
  }

  test("urlPolicy: RFC 9309 precedence — longest prefix, allow ties, default allow") {
    val rules = Seq(
      ("Ex.com", "/", false),          // rule hosts lowercase on entry
      ("ex.com", "/blog/", true),      // longer allow carve-out
      ("ex.com", "/blog/priv", false), // even longer re-disallow
      ("tie.com", "/a/", true),
      ("tie.com", "/a/", false)        // exact tie → allow wins
    ).toDF("host", "path_prefix", "allow")
    val urls = Seq(
      (1L, "https://ex.com/blog/post"),     // /blog/ allow (len 6 > 1)
      (2L, "https://EX.com:8443/shop/x"),   // '/' disallow (host casing+port)
      (3L, "https://ex.com/blog/private"),  // /blog/priv disallow (len 10)
      (4L, "https://other.com/anything"),   // unknown host → default allow
      (5L, "https://ex.com"),               // empty path ≡ '/' → disallow
      (6L, "https://tie.com/a/b")           // tie → allow
    ).toDF("id", "url")
    val got = UrlOps.urlPolicy(urls, "url", rules)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[Int]("rule_len")))).toMap
    assert(got(1L) === ((true, 6)))
    assert(got(2L) === ((false, 1)))
    assert(got(3L) === ((false, 10)))
    assert(got(4L) === ((true, -1)))
    assert(got(5L) === ((false, 1)))
    assert(got(6L) === ((true, 3)))
    // missing columns fail loudly
    intercept[IllegalArgumentException](
      UrlOps.urlPolicy(urls, "url", Seq(("h", "/")).toDF("host", "prefix")))
  }

  test("non-URL inputs degrade to empty parts, never throw") {
    for (bad <- Seq("", "no scheme here", "mailto:x@y.z")) {
      assert(eval(bad, UrlOps.host) === "")
      assert(eval(bad, UrlOps.pathDepth) === 0)
      assert(eval(bad, UrlOps.canonical) === "")
    }
  }

  private def rules(host: String, text: String, agent: String = "graftbot") =
    UrlOps.robotsRules(Seq((host, text)).toDF("host", "text"),
        "host", "text", agent)
      .select("path_prefix", "allow").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1).toSeq

  test("robotsRules: group selection picks the longest matching agent") {
    val txt = """# policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/pub/
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin
    assert(rules("h", txt) ===
      Seq(("/private/", false), ("/private/pub/", true)))
    // an unrelated token falls through to the * group
    assert(rules("h", txt, agent = "otherbot") === Seq(("/", false)))
  }

  test("robotsRules: case-insensitive fields, merge of equally specific groups") {
    val txt = """USER-AGENT: *
      |DISALLOW: /all/
      |user-agent: graft
      |disallow: /g/
      |User-Agent: graftbot
      |User-Agent: otherbot
      |Disallow: /gb/
      |User-agent: GraftBot
      |Disallow: /gb2/
      |""".stripMargin
    // both spec-8 groups merge; the spec-5 "graft" and spec-0 * lose
    assert(rules("h", txt) === Seq(("/gb/", false), ("/gb2/", false)))
    // shared-group membership: otherbot gets the same merged... no —
    // otherbot's best is the exact spec-8 group only
    assert(rules("h", txt, agent = "otherbot") === Seq(("/gb/", false)))
  }

  test("robotsRules: blank lines don't end groups; orphan rules dropped; empty pattern = no rule") {
    val txt = """Disallow: /orphan/
      |
      |User-agent: specificbot
      |Disallow: /s/
      |
      |User-agent: *
      |
      |Disallow:
      |Allow: /a*
      |Disallow: /b$
      |Sitemap: https://h/sitemap.xml
      |""".stripMargin
    // graftbot selects *: empty Disallow dropped, trailing * is plain
    // prefix, $-exact disallow folds conservatively to the prefix
    assert(rules("h", txt) === Seq(("/a", true), ("/b", false)))
  }

  test("robotsRules: conservative wildcard folding") {
    val txt = """User-agent: graftbot
      |Disallow: /x/*/secret
      |Disallow: /exact$
      |Allow: /ok/*
      |Allow: /widened/*/deep
      |Allow: /alsoexact$
      |Allow: /pfx*$
      |""".stripMargin
    // disallows fold (over-block); widened allows are dropped; the
    // prefix-equivalent tails * and *$ survive on allows
    assert(rules("h", txt) === Seq(
      ("/exact", false), ("/ok/", true), ("/pfx", true), ("/x/", false)))
    val parsed = UrlOps.robotsRules(
        Seq(("h", txt)).toDF("host", "text"), "host", "text", "graftbot")
    val widened = parsed
      .filter(col("widened")).select("from_pattern").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(widened === Seq("/exact$", "/x/*/secret"))
    // match_len carries the RAW pattern length (the RFC precedence
    // key), not the folded prefix length
    val lens = parsed.select("from_pattern", "match_len").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lens === Map("/x/*/secret" -> 11, "/exact$" -> 7,
      "/ok/*" -> 5, "/pfx*$" -> 6))
  }

  test("widened disallow is not outranked by a shorter allow (raw-length precedence)") {
    // the under-block regression: /x/*/secret folds to prefix /x/
    // (len 3); a len-7 allow carve-out must NOT outrank it — RFC 9309
    // raw-length precedence blocks /x/pub/secret (disallow len 12)
    val robots = Seq(("h.com",
      "User-agent: graftbot\nDisallow: /x/*/secret\nAllow: /x/pub/"))
      .toDF("host", "text")
    val urls = Seq(
      (1L, "https://h.com/x/pub/secret"), // RFC: disallow 12 > allow 7
      (2L, "https://h.com/x/pub/ok"),     // RFC: only allow matches — but
                                          // the fold over-blocks (documented)
      (3L, "https://h.com/y/free"))       // no match: default allow
      .toDF("id", "url")
    def decisions(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "allowed").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val folded = decisions(UrlOps.urlPolicy(urls, "url",
      UrlOps.robotsRules(robots, "host", "text", "graftbot")))
    val exact = decisions(UrlOps.urlPolicyPatterns(urls, "url",
      UrlOps.robotsRulesExact(robots, "host", "text", "graftbot")))
    // the RFC-exact gate: blocked, allowed, allowed
    assert(exact === Map(1L -> false, 2L -> true, 3L -> true))
    // the conservative fold: never under-blocks (1 stays blocked);
    // 2 over-blocks — the documented safe direction
    assert(folded === Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("robotsSitemaps: group-independent, scheme colon preserved, comments stripped") {
    val txt = """User-agent: graftbot
      |Disallow: /x/
      |Sitemap: https://h/a.xml
      |# Sitemap: https://h/commented.xml
      |User-agent: other
      |SITEMAP:   https://h/b.xml   # trailing comment
      |Sitemap:
      |""".stripMargin
    val out = UrlOps.robotsSitemaps(
        Seq(("h", txt)).toDF("host", "text"), "host", "text")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(out === Seq("https://h/a.xml", "https://h/b.xml"))
  }

  test("urlPolicyPatterns: RFC 9309 full */$ semantics") {
    val rules = Seq(
      ("h.com", "/gb/", false),
      ("h.com", "/gb/ok$", true),      // exact-path allow carve-out
      ("h.com", "/x/*/secret", false), // interior wildcard
      ("h.com", "/a*", true),
      ("h.com", "/lit.+()[]{}|", false) // regex metachars are literal
    ).toDF("host", "pattern", "allow")
    val urls = Seq(
      (1L, "https://h.com/gb/ok"),        // $ anchor holds: allow (len 7)
      (2L, "https://h.com/gb/okay"),      // $ fails: /gb/ disallow
      (3L, "https://h.com/x/mid/secret"), // * spans a segment: disallow
      (4L, "https://h.com/x/mid/safe"),   // no /secret: default allow
      (5L, "https://h.com/x/a/b/secretX"),// * greedy across segments
      (6L, "https://h.com/a-anything"),   // trailing *: prefix allow
      (7L, "https://h.com/lit.+()[]{}|rest"), // literal metachars match
      (8L, "https://h.com/litX"),         // and only literally
      (9L, "https://other.com/x"))        // unknown host: default allow
      .toDF("id", "url")
    val out = UrlOps.urlPolicyPatterns(urls, "url", rules)
      .select("id", "rule_len", "allowed").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L) === ((7, true)))
    assert(out(2L) === ((4, false)))
    assert(out(3L) === ((11, false)))
    assert(out(4L) === ((-1, true)))
    assert(out(5L) === ((11, false)))
    assert(out(6L) === ((3, true)))
    assert(out(7L) === ((13, false)))
    assert(out(8L) === ((-1, true)))
    assert(out(9L) === ((-1, true)))
  }

  test("robotsRulesExact + urlPolicyPatterns ≡ conservative fold where the fold is exact") {
    val robots = Seq(("h.com",
      "User-agent: graftbot\nDisallow: /private/\nAllow: /private/pub/\nDisallow: /tmp*"))
      .toDF("host", "text")
    val urls = Seq(
      (1L, "https://h.com/private/x"), (2L, "https://h.com/private/pub/x"),
      (3L, "https://h.com/tmp-file"), (4L, "https://h.com/ok"))
      .toDF("id", "url")
    def decisions(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "allowed").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = decisions(UrlOps.urlPolicyPatterns(urls, "url",
      UrlOps.robotsRulesExact(robots, "host", "text", "graftbot")))
    val folded = decisions(UrlOps.urlPolicy(urls, "url",
      UrlOps.robotsRules(robots, "host", "text", "graftbot")))
    assert(exact === folded) // no widened rules in this body
    assert(exact === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("sitemapUrls: urlset + sitemapindex, lastmod optional, junk dropped") {
    val xml = """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      | <url><loc> https://h/a </loc><lastmod>2026-08-01</lastmod></url>
      | <url><loc>https://h/b</loc></url>
      | <url><lastmod>2026-08-02</lastmod></url>
      |</urlset>""".stripMargin
    val idx = """<sitemapindex>
      | <sitemap><loc>https://h/s1.xml</loc><lastmod>2026-07-01</lastmod></sitemap>
      | <sitemap><loc>https://h/s2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
    val out = UrlOps.sitemapUrls(
        Seq(("h", xml), ("i", idx)).toDF("host", "text"), "host", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull))
      .sortBy(x => (x._1, x._3))
    assert(out.toSeq === Seq(
      ("h", "url", "https://h/a", "2026-08-01"),
      ("h", "url", "https://h/b", null), // loc-less entry dropped
      ("i", "sitemap", "https://h/s1.xml", "2026-07-01"),
      ("i", "sitemap", "https://h/s2.xml", null)))
  }

  test("robotsCrawlDelays: group-scoped, max-of-merged, junk ignored") {
    val txt = """User-agent: *
      |Crawl-delay: 10
      |Disallow: /x/
      |
      |User-agent: graftbot
      |Crawl-delay: 2
      |Disallow: /y/
      |User-agent: graftbot
      |Crawl-delay: 3.5
      |
      |User-agent: junkbot
      |Crawl-delay: soon
      |""".stripMargin
    def delays(agent: String) =
      UrlOps.robotsCrawlDelays(Seq(("h", txt)).toDF("host", "text"),
          "host", "text", agent)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // graftbot: two spec-8 groups merge -> max(2, 3.5)
    assert(delays("graftbot") === Map("h" -> 3.5))
    // unmatched token falls to *: 10
    assert(delays("otherbot") === Map("h" -> 10.0))
    // junkbot's own group has no parseable delay -> absent
    assert(delays("junkbot") === Map.empty)
    // the crawl-delay line between the two graftbot user-agent lines
    // SEPARATES them into two groups: /y/ belongs to the first only
    val rules = UrlOps.robotsRules(Seq(("h", txt)).toDF("host", "text"),
        "host", "text", "graftbot")
      .select("path_prefix").collect().map(_.getString(0)).sorted.toSeq
    assert(rules === Seq("/y/"))
  }

  test("resolveRef: RFC 3986 reference resolution") {
    val base = "https://h.com/a/b/index.html?old=1"
    def res(ref: String): Any =
      Seq((base, ref)).toDF("b", "r")
        .select(UrlOps.resolveRef(col("b"), col("r"))).head.get(0)
    // RFC 3986 §5.4 normal examples (adapted to the http base)
    assert(res("g") === "https://h.com/a/b/g")
    assert(res("./g") === "https://h.com/a/b/g")
    assert(res("g/") === "https://h.com/a/b/g/")
    assert(res("/g") === "https://h.com/g")
    assert(res("//cdn.com/x.js") === "https://cdn.com/x.js")
    assert(res("?y=2") === "https://h.com/a/b/index.html?y=2")
    assert(res("g?y=2") === "https://h.com/a/b/g?y=2")
    assert(res("..") === "https://h.com/a/")
    assert(res("../") === "https://h.com/a/")
    assert(res("../g") === "https://h.com/a/g")
    assert(res("../../g") === "https://h.com/g")
    // abnormal: .. above root is removed, not kept
    assert(res("../../../g") === "https://h.com/g")
    assert(res(".") === "https://h.com/a/b/")
    // fragments strip; fragment-only and non-http schemes drop
    assert(res("g#frag") === "https://h.com/a/b/g")
    assert(res("#top") === null)
    assert(res("") === null)
    assert(res("mailto:a@b.c") === null)
    assert(res("javascript:void(0)") === null)
    // absolute http(s) passes through (minus fragment)
    assert(res("http://other.com/p?q=1#f") === "http://other.com/p?q=1")
    // §5.2.2: dot segments are removed from ABSOLUTE references too —
    // an un-normalized path would evade prefix-matched robots rules
    assert(res("https://x.com/public/../private/p?q=1")
      === "https://x.com/private/p?q=1")
    assert(res("//cdn.com/a/./b/../c.js") === "https://cdn.com/a/c.js")
    // bare-domain absolute ref: nothing to normalize, passes through
    assert(res("https://x.com") === "https://x.com")
    // bare-domain base merges at root
    val bare = Seq(("https://h.com", "x/y")).toDF("b", "r")
      .select(UrlOps.resolveRef(col("b"), col("r"))).head.getString(0)
    assert(bare === "https://h.com/x/y")
  }

  test("canonicalWithQuery: tracking params collapse, meaningful queries stay") {
    assert(eval("HTTP://E.com/watch/?v=A&utm_source=x#f",
      UrlOps.canonicalWithQuery) === "http://e.com/watch?v=A")
    assert(eval("http://e.com/watch?v=B", UrlOps.canonicalWithQuery)
      === "http://e.com/watch?v=B") // ≠ the v=A key
    assert(eval("http://e.com/a?utm_source=x", UrlOps.canonicalWithQuery)
      === "http://e.com/a")
    assert(eval("http://e.com/a", UrlOps.canonicalWithQuery)
      === "http://e.com/a") // ≡ the tracking-only variant
    assert(eval("not a url", UrlOps.canonicalWithQuery) === "")
  }

  test("extractOutlinks: quoted href/src, base tag honored and excluded, explode") {
    val html = """<html><head><base href="/based/deep/"></head><body>
      |<a href="rel/p.html">r</a>
      |<a href='/abs/q'>a</a>
      |<img src='img.png'>
      |<a href="../up.html#frag">u</a>
      |<a href="https://ext.net/e?x=1#y">e</a>
      |<a href="#top">skip</a>
      |<a href="mailto:a@b">skip</a>
      |</body></html>""".stripMargin
    val out = UrlOps.extractOutlinks(
        Seq((7L, "https://h.com/sec/index.html", html))
          .toDF("id", "url", "html"), "url", "html")
      .select("outlink").collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq(
      "https://ext.net/e?x=1",          // absolute, fragment stripped
      "https://h.com/abs/q",            // absolute path: base tag's host
      "https://h.com/based/deep/img.png", // relative vs <base>
      "https://h.com/based/deep/rel/p.html",
      "https://h.com/based/up.html"))   // ../ against the <base> dir
    // no base tag: resolution is against the page URL; the base-less
    // page also proves the <base> href itself never leaks as a link
    val plain = UrlOps.extractOutlinks(
        Seq((8L, "https://h.com/sec/index.html",
          """<a href="rel/p.html">r</a><a href="../up.html">u</a>"""))
          .toDF("id", "url", "html"), "url", "html")
      .select("outlink").collect().map(_.getString(0)).sorted.toSeq
    assert(plain === Seq("https://h.com/sec/rel/p.html",
      "https://h.com/up.html"))
    // data-href / data-src / ng-src are NOT links (attribute boundary)
    val decoys = UrlOps.extractOutlinks(
        Seq((9L, "https://h.com/p",
          "<div data-href=\"/ad/click\">x</div>" +
            "<img data-src='/spinner.gif' src=\"/real.png\">" +
            "<a ng-href='/ng' href=\"/ok\">y</a>"))
          .toDF("id", "url", "html"), "url", "html")
      .select("outlink").collect().map(_.getString(0)).sorted.toSeq
    assert(decoys === Seq("https://h.com/ok", "https://h.com/real.png"))
  }

  test("extractAnchors: absolutized target + cleaned anchor text") {
    val html = "<a href=\"/p1\">Doc <b>one</b>  title</a>\n" +
      "<a href='rel2' class=\"x\">second\nlink</a>\n" +
      "<a href=\"#f\">skip</a><img src=\"i.png\">" +
      "<a href=\"mailto:a@b\">skip too</a>"
    val out = UrlOps.extractAnchors(
        Seq((1L, "https://h.com/d/x.html", html)).toDF("id", "url", "html"),
        "url", "html")
      .select("outlink", "anchor").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // inner markup stripped, whitespace (incl. newline) collapsed;
    // fragment-only and mailto anchors dropped; img src is NOT an anchor
    assert(out === Set(
      ("https://h.com/p1", "Doc one title"),
      ("https://h.com/d/rel2", "second link")))
    // base tag rebases relative targets, exactly like extractOutlinks
    val based = UrlOps.extractAnchors(
        Seq((2L, "https://h.com/d/x.html",
          "<base href=\"/b/\"><a href='rel2'>t</a>")).toDF("id", "url", "html"),
        "url", "html")
      .select("outlink").collect().map(_.getString(0)).toSeq
    assert(based === Seq("https://h.com/b/rel2"))
    // <a data-href=...> is not a link; href elsewhere in the tag still is
    val decoy = UrlOps.extractAnchors(
        Seq((3L, "https://h.com/p",
          "<a data-href=\"/ad\">no</a><a class='k' href=\"/yes\">ok</a>"))
          .toDF("id", "url", "html"), "url", "html")
      .select("outlink", "anchor").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(decoy === Set(("https://h.com/yes", "ok")))
  }

  test("extraction is tag-context aware: comments, script/style bodies, prose are not links") {
    val html =
      """<html><head>
        |<!-- <base href="/hijack/"> <a href="/phantom-comment">c</a> -->
        |<script>var u = ' href="/phantom-script" '; // src="/p2"
        |</script>
        |<style>.x { background: url("bg.png"); } /* href="/p3" */</style>
        |<script src="/real.js"></script>
        |</head><body>
        |<p>see the attribute href="/phantom-prose" in docs</p>
        |<a href="/ok">anchor <!-- hidden --> text</a>
        |</body></html>""".stripMargin
    val out = UrlOps.extractOutlinks(
        Seq((1L, "https://h.com/d/x.html", html)).toDF("id", "url", "html"),
        "url", "html")
      .select("outlink").collect().map(_.getString(0)).sorted.toSeq
    // the commented-out <base> must NOT rebase /ok; the script TAG's
    // own src is a real link, its body is not
    assert(out === Seq("https://h.com/ok", "https://h.com/real.js"))
    val anchors = UrlOps.extractAnchors(
        Seq((1L, "https://h.com/d/x.html", html)).toDF("id", "url", "html"),
        "url", "html")
      .select("outlink", "anchor").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // comment content inside the anchor body is not anchor text
    assert(anchors === Set(("https://h.com/ok", "anchor text")))
  }

  test("robotsRules composes with urlPolicy (parsed rules gate URLs)") {
    val robots = Seq(
      ("src1.example.com", "User-agent: graftbot\nDisallow: /private/\nAllow: /private/pub/"),
      ("src2.example.com", "User-agent: *\nDisallow: /")).toDF("host", "text")
    val r = UrlOps.robotsRules(robots, "host", "text", "graftbot")
    val urls = Seq(
      (1L, "https://src1.example.com/private/x"),
      (2L, "https://src1.example.com/private/pub/x"),
      (3L, "https://src1.example.com/open/x"),
      (4L, "https://src2.example.com/anything"),
      (5L, "https://unknown.example.com/x")).toDF("id", "url")
    val out = UrlOps.urlPolicy(urls, "url", r)
      .select("id", "allowed").collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
  }
}
