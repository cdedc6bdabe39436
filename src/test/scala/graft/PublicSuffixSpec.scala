package graft

import org.apache.spark.sql.functions._

import graft.functions.PublicSuffix

/** PSL registered-domain: algorithm cases (plain / wildcard / exception
  * rules, longest-match precedence, hosts that ARE a public suffix) and
  * the scale-shape guard — rules and map-back join both broadcast, no
  * sort-merge join, no cartesian. */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def domains(hosts: String*): Map[String, Option[String]] =
    PublicSuffix.domainMap(spark, hosts.toDF("h"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap

  test("plain rules: longest label match wins") {
    val d = domains("example.com", "a.example.com", "bbc.co.uk",
      "news.bbc.co.uk", "deep.news.bbc.co.uk", "xco.uk")
    assert(d("example.com") === Some("example.com"))
    assert(d("a.example.com") === Some("example.com"))
    // co.uk (2 labels) must beat uk (1 label)
    assert(d("bbc.co.uk") === Some("bbc.co.uk"))
    assert(d("news.bbc.co.uk") === Some("bbc.co.uk"))
    assert(d("deep.news.bbc.co.uk") === Some("bbc.co.uk"))
    // label-boundary: "xco.uk" does NOT match rule co.uk, only uk
    assert(d("xco.uk") === Some("xco.uk"))
  }

  test("hosts that ARE a public suffix, and single-label hosts, have none") {
    val d = domains("co.uk", "com", "uk", "localhost", "github.io")
    assert(d.values.forall(_.isEmpty))
  }

  test("wildcard rules: the star-matched label is part of the suffix") {
    val d = domains("foo.kawasaki.jp", "a.foo.kawasaki.jp",
      "b.a.foo.kawasaki.jp", "kawasaki.jp", "w.example.ck")
    assert(d("foo.kawasaki.jp") === None) // IS a public suffix
    assert(d("a.foo.kawasaki.jp") === Some("a.foo.kawasaki.jp"))
    assert(d("b.a.foo.kawasaki.jp") === Some("a.foo.kawasaki.jp"))
    // the wildcard needs a label for *; bare kawasaki.jp falls to rule jp
    assert(d("kawasaki.jp") === Some("kawasaki.jp"))
    assert(d("w.example.ck") === Some("w.example.ck"))
  }

  test("exception rules override their wildcard") {
    val d = domains("city.kawasaki.jp", "sub.city.kawasaki.jp",
      "www.ck", "x.www.ck")
    assert(d("city.kawasaki.jp") === Some("city.kawasaki.jp"))
    assert(d("sub.city.kawasaki.jp") === Some("city.kawasaki.jp"))
    assert(d("www.ck") === Some("www.ck"))
    assert(d("x.www.ck") === Some("www.ck"))
  }

  test("default rule: unknown TLD keeps last two labels; case folded; private entries") {
    val d = domains("a.b.unknowntld", "UP.Example.COM", "user.github.io",
      "p.user.github.io")
    assert(d("a.b.unknowntld") === Some("b.unknowntld"))
    assert(d("up.example.com") === Some("example.com"))
    assert(d("user.github.io") === Some("user.github.io"))
    assert(d("p.user.github.io") === Some("user.github.io"))
  }

  test("withRegisteredDomain: lowercases, strips port, leaves non-URLs null") {
    val df = Seq(
      (1L, "https://News.BBC.co.uk:8080/x?y=1"),
      (2L, "https://a.example.com/p"),
      (3L, "not a url")).toDF("id", "url")
    val out = PublicSuffix.withRegisteredDomain(spark, df, col("url"))
      .select("id", "host", "registered_domain")
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(out(1L) === (("news.bbc.co.uk", Some("bbc.co.uk"))))
    assert(out(2L) === (("a.example.com", Some("example.com"))))
    assert(out(3L) === (("", None)))
  }

  test("scale shape: PSL rules broadcast, map-back stays an unhinted equi-join") {
    val q = SparkEntry.queries("q_registered_domain_psl")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    // the ~9k-rule PSL table is literal-bounded — always broadcast
    assert(plan.contains("BroadcastHashJoin"), "the PSL rules join must broadcast")
    assert(!plan.contains("CartesianProduct"))
    // the host→domain map-back is deliberately UNHINTED (a web corpus
    // has ~10⁸ distinct hosts; a forced broadcast would OOM the driver
    // there) — AQE broadcasts at runtime when the map measures small,
    // so the INITIAL plan may show SortMergeJoin. Assert the join is
    // still a host-keyed equi-join, not a nested loop.
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("oracleCaseSql is generated from the same snapshot (smoke: mentions every rule kind)") {
    val sql = PublicSuffix.oracleCaseSql("hnp")
    assert(sql.contains("city.kawasaki.jp")) // exception branch
    assert(sql.contains("kawasaki\\.jp"))    // wildcard branch
    assert(sql.contains("co\\.uk"))          // plain ccTLD branch
    assert(sql.endsWith("ELSE NULL END"))
  }
}
