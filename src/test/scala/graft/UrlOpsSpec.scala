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
}
