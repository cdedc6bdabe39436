package graft

import graft.operators.Crawl

class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private def page(u: String, links: String*): (String, String) =
    (u, links.map(l => s"""<a href="$l">x</a>""")
      .mkString("<html><body>", "", "</body></html>"))

  // chain a → b → c → d with a back-edge d → a (cycle) and an
  // unreachable island e → f; b's link is RELATIVE (resolution is on
  // the adjudicated path every hop)
  private lazy val pages = Seq(
    page("https://h.com/a", "/b"),
    page("https://h.com/b", "c"),
    page("https://h.com/c", "/d"),
    page("https://h.com/d", "/a"),
    page("https://h.com/e", "/f")).toDF("url", "html")

  private def run(seed: String, hops: Int): Map[String, Int] =
    Crawl.bfs(pages, "url", "html", Seq(seed).toDF("u"), "u", hops)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("bfs: min-hop labels, cycle absorbed, island unreached, early exit") {
    // hops=10 but the component drains at hop 3 — early exit, and the
    // d→a back-edge never re-labels a
    val out = run("https://h.com/a", hops = 10)
    assert(out === Map("https://h.com/a" -> 0, "https://h.com/b" -> 1,
      "https://h.com/c" -> 2, "https://h.com/d" -> 3))
  }

  test("bfs: hop cap truncates the expansion") {
    val out = run("https://h.com/a", hops = 2)
    assert(out === Map("https://h.com/a" -> 0, "https://h.com/b" -> 1,
      "https://h.com/c" -> 2))
    assert(run("https://h.com/a", hops = 0)
      === Map("https://h.com/a" -> 0))
  }

  test("bfs: discovered-but-unfetchable URLs are reported, fetch nothing") {
    // /f has no page row: discovered at hop 1, contributes no links
    assert(run("https://h.com/e", hops = 5)
      === Map("https://h.com/e" -> 0, "https://h.com/f" -> 1))
    // a seed with no page row is still hop 0
    assert(run("https://h.com/nope", hops = 3)
      === Map("https://h.com/nope" -> 0))
  }

  test("bfs: multiple seeds take the min hop across seeds") {
    val out = Crawl.bfs(pages, "url", "html",
        Seq("https://h.com/a", "https://h.com/c").toDF("u"), "u", 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // c is a seed (0), d reached from c at 1 — not from a at 3
    assert(out === Map("https://h.com/a" -> 0, "https://h.com/b" -> 1,
      "https://h.com/c" -> 0, "https://h.com/d" -> 1))
  }

  test("resolveRedirects: chains collapse, cycles surface, duplicates dedup deterministically") {
    val edges = Seq(
      // 3-hop chain into a terminal
      ("http://x/a", "http://x/b"), ("http://x/b", "http://x/c"),
      ("http://x/c", "http://x/final"),
      // 2-cycle
      ("http://x/p", "http://x/q"), ("http://x/q", "http://x/p"),
      // self-redirect
      ("http://x/s", "http://x/s"),
      // duplicate source: max(dst) wins deterministically
      ("http://x/d", "http://x/t1"), ("http://x/d", "http://x/t2"))
      .toDF("src", "dst")
    val out = Crawl.resolveRedirects(edges, "src", "dst", maxHops = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("http://x/a") === (("http://x/final", 3L, true)))
    assert(out("http://x/b") === (("http://x/final", 2L, true)))
    assert(out("http://x/c") === (("http://x/final", 1L, true)))
    // cycle members compose to themselves at the 16-hop bound, still
    // redirecting → unresolved, never an infinite loop
    assert(out("http://x/p") === (("http://x/p", 16L, false)))
    assert(out("http://x/q") === (("http://x/q", 16L, false)))
    assert(out("http://x/s") === (("http://x/s", 16L, false)))
    assert(out("http://x/d") === (("http://x/t2", 1L, true)))
    intercept[IllegalArgumentException](
      Crawl.resolveRedirects(edges, "src", "dst", maxHops = 0))
  }

  test("mergeHostEdges: orientation-normalized set union, idempotent") {
    val standing = Seq(("a.com", "b.com"), ("c.com", "b.com"))
      .toDF("ha", "hb")
    // the increment re-reports (b,a) in the OTHER orientation plus one
    // genuinely new edge
    val inc = Seq(("b.com", "a.com"), ("a.com", "d.com")).toDF("ha", "hb")
    val merged = Crawl.mergeHostEdges(standing, inc)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(merged === Set(("a.com", "b.com"), ("b.com", "c.com"),
      ("a.com", "d.com")))
    // folding the same increment again changes nothing (set semantics —
    // a re-parsed segment cannot double-count an edge)
    val again = Crawl.mergeHostEdges(
      Crawl.mergeHostEdges(standing, inc), inc)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(again === merged)
  }

  test("mergeHostEdges: NULL-endpoint edges drop — never become self-loops") {
    // least/greatest skip NULLs in Spark: without the filter an edge
    // (a.com, NULL) would normalize to the self-loop (a.com, a.com)
    // and silently perturb downstream PageRank
    val standing = Seq(("a.com", "b.com")).toDF("ha", "hb")
    val inc = Seq((null, "a.com"), ("c.com", null), (null, null),
      ("a.com", "c.com")).toDF("ha", "hb")
    val merged = Crawl.mergeHostEdges(standing, inc)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(merged === Set(("a.com", "b.com"), ("a.com", "c.com")))
  }
}
