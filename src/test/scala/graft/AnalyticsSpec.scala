package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize: 30-min gap splits sessions, boundary gap stays joined") {
    val events = Seq(
      // user 1: three events 10 min apart → one session...
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")),
      (3L, 10L, ts("2024-01-01 10:20:00")),
      // ...then a 31-min gap → second session
      (4L, 10L, ts("2024-01-01 10:51:00")),
      // user 2: exactly 30:00.000000 gap is NOT a split (strict >)
      (5L, 20L, ts("2024-01-01 09:00:00")),
      (6L, 20L, ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Analytics.sessionize(events, "user_id", "ts", "event_id", 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    assert(out === Map(
      (10L, 1L) -> ((3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"))),
      (10L, 2L) -> ((1L, ts("2024-01-01 10:51:00"), ts("2024-01-01 10:51:00"))),
      (20L, 1L) -> ((2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00")))))
  }

  test("funnel: strict first-occurrence order; missing/out-of-order break the prefix") {
    val events = Seq(
      // u1 full funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // u2 views then clicks, never purchases → depth 2
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:05:00")),
      // u3 clicked BEFORE first view → depth 1 (prefix broken at click),
      // and the later purchase can't count either
      (3L, "click", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00")),
      // u4 never viewed → depth 0
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("retention: cohorts by first day, offset-bounded distinct activity") {
    val events = Seq(
      // u1 first seen day 0, active days 0, 1, 9 (9 beyond maxOffset 7)
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 23:00:00")), // same day, distinct-collapsed
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")),
      // u2 same cohort, active days 0 and 1
      (2L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-02 01:00:00")),
      // u3 later cohort, only day 0
      (3L, ts("2024-01-05 08:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.retention(events, "user_id", "ts", maxOffsetDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 2L,
      ("2024-01-01", 1) -> 2L,
      ("2024-01-05", 0) -> 1L))
  }

  test("scd2History: runs collapse, intervals chain, current row open") {
    val events = Seq(
      // u1: A A B A → intervals A[t0,t2) B[t2,t3) A[t3,∞)
      (1L, 10L, "A", ts("2024-01-01 10:00:00")),
      (2L, 10L, "A", ts("2024-01-01 11:00:00")), // same value: no new version
      (3L, 10L, "B", ts("2024-01-01 12:00:00")),
      (4L, 10L, "A", ts("2024-01-01 13:00:00")),
      // u2: single value → one open interval
      (5L, 20L, "Z", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.scd2History(events, "user_id", "event_type", "ts",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(5)))).toMap
    assert(out === Map(
      (10L, 1) -> (("A", ts("2024-01-01 10:00:00"),
        Some(ts("2024-01-01 12:00:00")), false)),
      (10L, 2) -> (("B", ts("2024-01-01 12:00:00"),
        Some(ts("2024-01-01 13:00:00")), false)),
      (10L, 3) -> (("A", ts("2024-01-01 13:00:00"), None, true)),
      (20L, 1) -> (("Z", ts("2024-01-01 09:00:00"), None, true))))
  }

  test("scd2History: null attribute values form their own runs (null-safe compare)") {
    val events = Seq(
      (1L, 10L, Option.empty[String], ts("2024-01-01 10:00:00")),
      (2L, 10L, Option.empty[String], ts("2024-01-01 11:00:00")), // same (null) run
      (3L, 10L, Option("A"), ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.scd2History(events, "user_id", "event_type", "ts",
        "event_id").orderBy("version").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1) && !out(0).getBoolean(5))
    assert(out(1).getString(1) === "A" && out(1).getBoolean(5))
  }

  test("coOccurrencePairs: once per group, support floor, mega-group cap") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // dup item collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "a"), (4L, "b"), (4L, "c"), (4L, "d") // size-4 basket
    ).toDF("order_id", "item")
    val all = Analytics.coOccurrencePairs(baskets, "order_id", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(all(("x", "y")) === 3L) // counted once per basket despite dup x
    assert(all(("x", "z")) === 1L)
    val supported = Analytics.coOccurrencePairs(baskets, "order_id", "item",
      minCount = 2L).collect()
    assert(supported.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("x", "y")))
    // cap 3 drops basket 4 (4 distinct items) and basket 1 stays
    val capped = Analytics.coOccurrencePairs(baskets, "order_id", "item",
      maxGroupSize = Some(3))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.contains(("x", "z")))
    assert(!capped.exists(p => p._1 == "a" || p._2 == "b"))
  }

  test("degrees + triangleCount on known graphs") {
    def tri(edges: Seq[(Long, Long)]): Long =
      Analytics.triangleCount(edges.toDF("a", "b"), "a", "b")
        .collect().head.getLong(0)
    // triangle
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === 1L)
    // square: no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) === 0L)
    // K4: 4 triangles; edge list unnormalized + duplicated on purpose
    assert(tri(Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (4L, 3L), (3L, 4L))) === 4L)
    // star (hub 0): no triangles no matter the hub degree
    assert(tri((1L to 20L).map(i => (0L, i))) === 0L)
    // hub + one closing rim edge: exactly 1
    assert(tri((1L to 20L).map(i => (0L, i)) :+ ((5L, 6L))) === 1L)

    val deg = Analytics.degrees(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("transitionCounts: ordered next-event pairs per user, last event open") {
    val events = Seq(
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "click", ts("2024-01-01 10:01:00")),
      (3L, 10L, "view", ts("2024-01-01 10:02:00")),
      (4L, 10L, "click", ts("2024-01-01 10:03:00")),
      (5L, 20L, "view", ts("2024-01-01 10:00:00")),
      (6L, 20L, "view", ts("2024-01-01 10:05:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.transitionCounts(events, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("view", "click") -> 2L, ("click", "view") -> 1L,
      ("view", "view") -> 1L))
  }

  test("pageRank ≡ driver power iteration; ranks sum to 1") {
    def reference(edges: Seq[(Long, Long)], iters: Int,
        d: Double): Map[Long, Double] = {
      val und = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2)
        .distinct
      val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val nodes = adj.keySet.toSeq.sorted
      val n = nodes.size
      var r = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        r = nodes.map { v =>
          val in = adj(v).map(u => r(u) / adj(u).size).sum
          v -> ((1.0 - d) / n + d * in)
        }.toMap
      }
      r
    }
    // asymmetric graph: path + a hub
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (4L, 5L))
    val got = Analytics.pageRank(edges.toDF("a", "b"), "a", "b",
        iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = reference(edges, 10, 0.85)
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-10, s"$k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // symmetric sanity: triangle → exactly uniform
    val tri = Analytics.pageRank(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"), "a", "b", 5)
      .collect().map(_.getDouble(1))
    tri.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRankDirected ≡ driver power iteration with dangling mass; Σ rank = 1") {
    def reference(edges: Seq[(Long, Long)], iters: Int,
        d: Double): Map[Long, Double] = {
      val arcs = edges.filter(e => e._1 != e._2).distinct
      val out = arcs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val in = arcs.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
      val nodes = (arcs.map(_._1) ++ arcs.map(_._2)).distinct.sorted
      val n = nodes.size
      var r = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val dm = nodes.filter(v => !out.contains(v)).map(r).sum
        r = nodes.map { v =>
          val s = in.getOrElse(v, Seq.empty).map(u => r(u) / out(u).size).sum
          v -> ((1.0 - d) / n + d * (s + dm / n))
        }.toMap
      }
      r
    }
    // 5 is a SINK (no outlinks) and 6 links only out — both directed-
    // only shapes the undirected form can't produce
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 5L),
      (6L, 5L), (6L, 1L))
    val got = Analytics.pageRankDirected(edges.toDF("s", "t"), "s", "t",
        iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = reference(edges, 10, 0.85)
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-10, s"$k") }
    // the dangling-mass term is exactly what keeps Σ = 1 with a sink
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // theorem: on a SYMMETRIZED edge set (no sinks, in ≡ out) the
    // directed recurrence degenerates to the undirected one
    val sym = edges.flatMap(e => Seq(e, e.swap))
    val dirOnSym = Analytics.pageRankDirected(sym.toDF("s", "t"), "s", "t",
        iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val und = Analytics.pageRank(edges.toDF("a", "b"), "a", "b",
        iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dirOnSym.keySet === und.keySet)
    dirOnSym.foreach { case (k, v) =>
      assert(math.abs(v - und(k)) < 1e-12, s"node $k") }
  }

  test("pageRankDirectedWeighted ≡ driver power iteration; uniform weights ≡ pageRankDirected") {
    def reference(edges: Seq[(Long, Long, Double)], iters: Int,
        d: Double): Map[Long, Double] = {
      val arcs = edges.filter(e => e._1 != e._2 && e._3 > 0)
        .groupBy(e => (e._1, e._2))
        .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }.toSeq
      val wout = arcs.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
      val in = arcs.groupBy(_._2)
      val nodes = (arcs.map(_._1) ++ arcs.map(_._2)).distinct.sorted
      val n = nodes.size
      var r = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val dm = nodes.filter(v => !wout.contains(v)).map(r).sum
        r = nodes.map { v =>
          val s = in.getOrElse(v, Seq.empty)
            .map(e => r(e._1) * e._3 / wout(e._1)).sum
          v -> ((1.0 - d) / n + d * (s + dm / n))
        }.toMap
      }
      r
    }
    // 5 is a sink; the 1→2 edge carries 9× the weight of 1→3, so 2
    // must strictly outrank 3; a parallel (2,4) pair merges additively;
    // a zero-weight edge is dropped entirely (6→7 vanishes with 7)
    val edges = Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 4L, 1.0),
      (2L, 4L, 2.0), (3L, 4L, 1.0), (4L, 5L, 2.0), (6L, 1L, 1.0),
      (6L, 7L, 0.0))
    val got = Analytics.pageRankDirectedWeighted(
        edges.toDF("s", "t", "w"), "s", "t", "w", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = reference(edges, 10, 0.85)
    assert(got.keySet === ref.keySet)
    assert(!got.keySet.contains(7L), "zero-weight edge must not add a node")
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-10, s"$k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got(2L) > got(3L), "9:1 weight split must rank 2 over 3")
    // reduction theorem: all-equal weights ≡ the uniform directed form
    // (weight 2.0 keeps the comparison bit-exact: 2r and 2k are exact
    // doubles and (2r)/(2k) rounds the same quotient as r/k)
    val uni = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 5L),
      (6L, 5L), (6L, 1L))
    val w1 = Analytics.pageRankDirectedWeighted(
        uni.map(e => (e._1, e._2, 2.0)).toDF("s", "t", "w"), "s", "t", "w",
        iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prd = Analytics.pageRankDirected(uni.toDF("s", "t"), "s", "t",
        iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1.keySet === prd.keySet)
    w1.foreach { case (k, v) => assert(math.abs(v - prd(k)) < 1e-12, s"$k") }
  }

  test("personalizedPageRank ≡ driver power iteration; uniform seeds ≡ pageRankDirected") {
    def reference(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
        d: Double): Map[Long, Double] = {
      val arcs = edges.filter(e => e._1 != e._2).distinct
      val out = arcs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val in = arcs.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
      val nodes = (arcs.map(_._1) ++ arcs.map(_._2)).distinct.sorted
      val s = seeds.intersect(nodes.toSet)
      def p(v: Long) = if (s(v)) 1.0 / s.size else 0.0
      var r = nodes.map(v => v -> p(v)).toMap
      for (_ <- 1 to iters) {
        val dm = nodes.filter(v => !out.contains(v)).map(r).sum
        r = nodes.map { v =>
          val c = in.getOrElse(v, Seq.empty).map(u => r(u) / out(u).size).sum
          v -> ((1.0 - d) * p(v) + d * (c + dm * p(v)))
        }.toMap
      }
      r
    }
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 5L),
      (6L, 5L), (6L, 1L))
    val seeds = Seq(1L, 6L, 99L) // 99 is outside the graph: ignored
    val got = Analytics.personalizedPageRank(edges.toDF("s", "t"), "s", "t",
        seeds.toDF("n"), "n", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = reference(edges, Set(1L, 6L), 10, 0.85)
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-10, s"$k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // restarts bias rank toward the seed neighborhood: the seed-fed 2
    // outranks the symmetric-but-unseeded 4
    assert(got(2L) > got(4L))
    // seeding EVERY node is the uniform teleport — degenerates to
    // pageRankDirected exactly
    val all = (1L to 6L).toDF("n")
    val ppr = Analytics.personalizedPageRank(edges.toDF("s", "t"), "s", "t",
        all, "n", iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prd = Analytics.pageRankDirected(edges.toDF("s", "t"), "s", "t",
        iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ppr.foreach { case (k, v) => assert(math.abs(v - prd(k)) < 1e-12, s"$k") }
  }

  test("hits ≡ driver power iteration; hub/authority zeros land where links don't") {
    def reference(edges: Seq[(Long, Long)],
        iters: Int): Map[Long, (Double, Double)] = {
      val arcs = edges.filter(e => e._1 != e._2).distinct
      val nodes = (arcs.map(_._1) ++ arcs.map(_._2)).distinct.sorted
      var h = nodes.map(_ -> 1.0).toMap
      var a = nodes.map(_ -> 0.0).toMap
      for (_ <- 1 to iters) {
        val a0 = nodes.map(v =>
          v -> arcs.filter(_._2 == v).map(e => h(e._1)).sum).toMap
        val na = math.sqrt(a0.values.map(x => x * x).sum)
        a = a0.map { case (k, v) => k -> v / na }
        val h0 = nodes.map(v =>
          v -> arcs.filter(_._1 == v).map(e => a(e._2)).sum).toMap
        val nh = math.sqrt(h0.values.map(x => x * x).sum)
        h = h0.map { case (k, v) => k -> v / nh }
      }
      nodes.map(v => v -> (h(v), a(v))).toMap
    }
    // 1 is a pure hub (out-only), 5 a pure authority (in-only)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 5L), (2L, 5L), (3L, 5L),
      (4L, 2L), (2L, 3L))
    val got = Analytics.hits(edges.toDF("s", "t"), "s", "t", iterations = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val ref = reference(edges, 8)
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (hv, av)) =>
      assert(math.abs(hv - ref(k)._1) < 1e-10, s"hub $k")
      assert(math.abs(av - ref(k)._2) < 1e-10, s"auth $k")
    }
    assert(got(1L)._2 === 0.0) // no in-links → zero authority
    assert(got(5L)._1 === 0.0) // no out-links → zero hub
    assert(got(5L)._2 > got(2L)._2) // everyone's target is top authority
  }

  test("triangleCount ≡ exhaustive count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (for (_ <- 1 to 120)
      yield (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2)
    val norm = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toSet
    val nodes = norm.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b && norm((a, b))
      c <- nodes if b < c && norm((b, c)) && norm((a, c))
    } yield 1).size.toLong
    assert(Analytics.triangleCount(edges.toDF("a", "b"), "a", "b")
      .collect().head.getLong(0) === expected)
  }

  test("applyChangelog: last-writer-wins, deletes, inserts, untouched keys") {
    val snapshot = Seq(
      (1L, 10, "a"), (2L, 20, "b"), (3L, 30, "c")).toDF("k", "v", "tag")
    val changes = Seq(
      // k=1: upsert then DELETE — latest wins, key gone
      (1L, 11, "a2", 1L, "U"), (1L, 12, "a3", 2L, "D"),
      // k=2: delete then re-upsert — latest wins, new value survives
      (2L, 21, "b2", 1L, "D"), (2L, 22, "b3", 2L, "U"),
      // k=4: pure insert (not in snapshot)
      (4L, 40, "d", 1L, "U"),
      // k=5: insert then delete — never materializes
      (5L, 50, "e", 1L, "U"), (5L, 51, "e2", 2L, "D")
    ).toDF("k", "v", "tag", "seq", "op")
    val out = Analytics.applyChangelog(snapshot, changes, "k",
        Seq("seq"), "op")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    assert(out === Map(
      2L -> ((22, "b3")),   // re-upserted
      3L -> ((30, "c")),    // untouched snapshot row
      4L -> ((40, "d"))))   // fresh insert
  }

  test("funnelWindowed: anchor walk, window bound, late-click recovery") {
    val ev = Seq(
      // u1 converts fully: view 10:00 → click 10:30 → purchase 11:00
      ("u1", ts("2024-01-01 10:00:00"), "view"),
      ("u1", ts("2024-01-01 10:30:00"), "click"),
      ("u1", ts("2024-01-01 11:00:00"), "purchase"),
      // u2: click OUTSIDE the 1h window → stops at step 1
      ("u2", ts("2024-01-01 10:00:00"), "view"),
      ("u2", ts("2024-01-01 11:30:00"), "click"),
      // u3: first click BEFORE the view, second after — the simple
      // funnel's min-click (09:00) fails the t1 > t0 check, but the
      // anchor walk finds the 10:20 click: windowed converts to step 2
      ("u3", ts("2024-01-01 09:00:00"), "click"),
      ("u3", ts("2024-01-01 10:00:00"), "view"),
      ("u3", ts("2024-01-01 10:20:00"), "click"),
      // u4: purchase before click → stops at step 2
      ("u4", ts("2024-01-01 10:00:00"), "view"),
      ("u4", ts("2024-01-01 10:05:00"), "purchase"),
      ("u4", ts("2024-01-01 10:10:00"), "click")
    ).toDF("user_id", "t", "event_type")
    val out = Analytics.funnelWindowed(ev, "user_id", "t", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 4L, 2 -> 3L, 3 -> 1L))
    // contrast with the first-occurrence funnel: same step-2 COUNT but
    // a different user set — it admits u2 (no window exists to exclude
    // the 11:30 click) while denying u3 (min-click 09:00 predates the
    // view; it never looks at the 10:20 recovery). Tightening the
    // window to 15 min separates the counts: windowed keeps only u4's
    // 10-min click; the windowless funnel still counts u1/u2/u4.
    val simple = Analytics.funnel(ev, "user_id", "t", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(simple(2) === 3L)
    val tight = Analytics.funnelWindowed(ev, "user_id", "t", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 900)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(tight(2) === 1L && simple(2) === 3L)
  }

  test("schemaDiff: added/removed/type-change/nullability, identical = empty") {
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val b = Seq((1L, 2, true)).toDF("id", "score", "flag")
      .select(col("id"), col("score"), col("flag"))
    val out = Analytics.schemaDiff(a, b)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(out("name")._1 === "removed")
    assert(out("flag")._1 === "added")
    assert(out("score")._1 === "changed") // DOUBLE -> INT
    assert(out("score")._2 === Some("DOUBLE NOT NULL") &&
      out("score")._3 === Some("INT NOT NULL"))
    assert(!out.contains("id")) // unchanged columns are silent
    assert(Analytics.schemaDiff(a, a).count() === 0)
    // nullability change alone is a change
    val nn = a.withColumn("name", coalesce(col("name"), lit("")))
    val d = Analytics.schemaDiff(a, nn).collect()
    assert(d.length === 1 && d.head.getString(1) === "changed")
  }

  test("timeWeightedAverage: hold-weighted mean, last sample weightless") {
    val df = Seq(
      // a: v=1 held 10 s, v=4 held 20 s, v=99 held nothing
      ("a", ts("2024-01-01 10:00:00"), 1L, 1.0),
      ("a", ts("2024-01-01 10:00:10"), 2L, 4.0),
      ("a", ts("2024-01-01 10:00:30"), 3L, 99.0),
      // b: single sample → nothing held → NULL
      ("b", ts("2024-01-01 10:00:00"), 4L, 7.0),
      // c: same-instant tie — id order totalizes: id 5 held 0 µs,
      // id 6 held 10 s → twa = value of id 6
      ("c", ts("2024-01-01 10:00:00"), 5L, 100.0),
      ("c", ts("2024-01-01 10:00:00"), 6L, 2.0),
      ("c", ts("2024-01-01 10:00:10"), 7L, 50.0)
    ).toDF("k", "t", "id", "v")
    val out = Analytics.timeWeightedAverage(df, "k", "t", "id", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out("a")._1 === 3L)
    assert(math.abs(out("a")._2.get - 3.0) < 1e-12) // (1*10 + 4*20) / 30
    assert(out("b")._2.isEmpty)
    assert(math.abs(out("c")._2.get - 2.0) < 1e-12) // id 5's 0-hold drops out
  }

  test("groupTrend: exact line recovered, degenerate groups null") {
    val df = Seq(
      // g1: perfect line y = 2x + 3
      ("g1", 0.0, 3.0), ("g1", 1.0, 5.0), ("g1", 2.0, 7.0), ("g1", 3.0, 9.0),
      // g2: flat series → slope 0, intercept = mean
      ("g2", 0.0, 4.0), ("g2", 1.0, 4.0), ("g2", 2.0, 4.0),
      // g3: single point → undefined
      ("g3", 5.0, 1.0),
      // g4: two points, same x → undefined (vertical)
      ("g4", 2.0, 1.0), ("g4", 2.0, 9.0)
    ).toDF("g", "x", "y")
    val out = Analytics.groupTrend(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("g1")._1 === 4L)
    assert(math.abs(out("g1")._2.get.asInstanceOf[Double] - 2.0) < 1e-12)
    assert(math.abs(out("g1")._3.get.asInstanceOf[Double] - 3.0) < 1e-12)
    assert(math.abs(out("g2")._2.get.asInstanceOf[Double]) < 1e-12)
    assert(math.abs(out("g2")._3.get.asInstanceOf[Double] - 4.0) < 1e-12)
    assert(out("g3")._2.isEmpty && out("g3")._3.isEmpty)
    assert(out("g4")._2.isEmpty && out("g4")._3.isEmpty)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe compares") {
    val old = Seq(
      (1L, Some("a"), "en"), (2L, Some("b"), "en"),
      (3L, Option.empty[String], "en"), (4L, Some("d"), "en")
    ).toDF("k", "txt", "lang")
    val neu = Seq(
      (1L, Some("a"), "en"),              // unchanged
      (2L, Some("B"), "en"),              // changed (value)
      (3L, Option.empty[String], "en"),   // unchanged: NULL <=> NULL
      (5L, Some("e"), "fr"),              // added
      (6L, Option.empty[String], "de")    // added with null payload
    ).toDF("k", "txt", "lang")
    val out = Analytics.snapshotDiff(old, neu, "k", Seq("txt", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added", 6L -> "added"))
    // null -> value on a compare column is a change, not an equality
    val old2 = Seq((1L, Option.empty[String], "en")).toDF("k", "txt", "lang")
    val neu2 = Seq((1L, Some("x"), "en")).toDF("k", "txt", "lang")
    assert(Analytics.snapshotDiff(old2, neu2, "k", Seq("txt", "lang"))
      .collect().head.getString(1) === "changed")
  }

  test("gapFillForward: calendar completion, carry-forward, leading nulls") {
    val d = java.sql.Date.valueOf(_: String)
    val daily = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0),   // 2nd/3rd are gaps carrying 1.0
      ("b", d("2024-01-03"), 9.0)    // b starts late: 1st/2nd lead-null
    ).toDF("k", "day", "v")
    val out = Analytics.gapFillForward(daily, "k", "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))))
      .toMap
    assert(out.size === 8) // 2 keys x 4-day global calendar
    assert(out(("a", "2024-01-01")) === ((Some(1.0), false)))
    assert(out(("a", "2024-01-02")) === ((Some(1.0), true)))
    assert(out(("a", "2024-01-03")) === ((Some(1.0), true)))
    assert(out(("a", "2024-01-04")) === ((Some(4.0), false)))
    // before b's first observation there is nothing to carry
    assert(out(("b", "2024-01-01")) === ((None, true)))
    assert(out(("b", "2024-01-02")) === ((None, true)))
    assert(out(("b", "2024-01-03")) === ((Some(9.0), false)))
    assert(out(("b", "2024-01-04")) === ((Some(9.0), true)))
  }

  test("activeIntervals: inclusive ends, nesting, cross-day carry-in") {
    val intervals = Seq(
      // two overlapping, one nested, one instantaneous
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      (ts("2024-01-01 10:40:00"), ts("2024-01-01 10:50:00")),
      (ts("2024-01-01 10:45:00"), ts("2024-01-01 10:45:00")),
      // spans midnight: exercises the day-partitioned carry-in
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),
      (ts("2024-01-02 00:30:00"), ts("2024-01-02 02:00:00"))
    ).toDF("s", "e")
    val out = Analytics.activeIntervals(intervals, "s", "e")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(out(ts("2024-01-01 10:00:00")) === 1L)
    assert(out(ts("2024-01-01 10:30:00")) === 2L)
    assert(out(ts("2024-01-01 10:40:00")) === 3L)
    assert(out(ts("2024-01-01 10:45:00")) === 4L) // instantaneous counts
    assert(out(ts("2024-01-01 10:50:00")) === 3L) // end is inclusive AT t
    assert(out(ts("2024-01-01 11:00:00")) === 2L)
    assert(out(ts("2024-01-01 12:00:00")) === 1L)
    // across midnight: the 23:00 interval is still active at 00:30
    assert(out(ts("2024-01-01 23:00:00")) === 1L)
    assert(out(ts("2024-01-02 00:30:00")) === 2L)
    assert(out(ts("2024-01-02 01:00:00")) === 2L)
    assert(out(ts("2024-01-02 02:00:00")) === 1L)
  }

  test("activeIntervals two-level decomposition ≡ naive global cumsum") {
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val intervals = (1 to 300).map { _ =>
      val s = base + rnd.nextInt(5 * 24 * 3600) * 1000L
      val e = s + rnd.nextInt(8 * 3600) * 1000L
      (new Timestamp(s), new Timestamp(e))
    }.toDF("s", "e")
    val got = Analytics.activeIntervals(intervals, "s", "e")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
    // naive reference: for each boundary t, count intervals with s<=t<=e
    val ivs = intervals.collect().map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
    val bounds = ivs.flatMap(i => Seq(i._1, i._2)).distinct.sorted
    val expected = bounds.map(t =>
      (new Timestamp(t), ivs.count(i => i._1 <= t && t <= i._2).toLong))
    assert(got.toSeq === expected.toSeq)
  }

  test("pageRank: symmetry, mass conservation, center dominance") {
    // path graph a–b–c: b is the center; a and c are symmetric
    val path = Seq((1L, 2L), (2L, 3L)).toDF("item_a", "item_b")
    val pr = Analytics.pageRank(path, "item_a", "item_b",
        iterations = 10, damping = 0.85)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet === Set(1L, 2L, 3L))
    // no dangling nodes → total mass exactly preserved (up to fp sum)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(1L) === pr(3L))
    assert(pr(2L) > pr(1L))
  }

  test("pageRank: regular graph is uniform at every iteration count") {
    // triangle: 2-regular → stationary from the start; any iteration
    // count must return exactly 1/3 (the recurrence maps 1/3 → 1/3
    // only if contributions and teleport recombine exactly)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    for (iters <- Seq(1, 7)) {
      val pr = Analytics.pageRank(tri, "a", "b", iterations = iters)
        .collect().map(_.getDouble(1))
      assert(pr.length === 3)
      pr.foreach(v => assert(math.abs(v - 1.0 / 3.0) < 1e-12))
    }
  }

  test("pageRank: ring with pendant — hand-checked single iteration") {
    // nodes: ring 1-2-3 plus pendant 4 attached to 1
    // degrees: 1→3, 2→2, 3→2, 4→1; N=4, start 0.25 each, d=0.85
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val pr = Analytics.pageRank(g, "a", "b", iterations = 1)
      .orderBy("node").collect().map(_.getDouble(1))
    val t = 0.15 / 4
    // in(1) = r2/2 + r3/2 + r4/1 = .125+.125+.25 = .5
    // in(2) = r1/3 + r3/2 = .0833..+.125 ; in(3) same; in(4) = r1/3
    val exp = Seq(t + 0.85 * 0.5,
      t + 0.85 * (0.25 / 3 + 0.125), t + 0.85 * (0.25 / 3 + 0.125),
      t + 0.85 * (0.25 / 3))
    pr.zip(exp).foreach { case (g2, e) => assert(math.abs(g2 - e) < 1e-12) }
  }

  test("sequenceGaps: in-bucket, bucket-straddling, and whole-missing-bucket holes; duplicates collapse") {
    import spark.implicits._
    // bucketSize 10: present = 1..8, 12..19, 41..45, plus duplicates.
    // Gaps: 9-11 (straddles buckets 0→1), 20-40 (covers the whole
    // missing buckets 2 and 3). Values outside [min,max] are not gaps.
    val ids = ((1L to 8L) ++ (12L to 19L) ++ (41L to 45L) ++ Seq(5L, 44L))
      .toDF("id")
    val out = Analytics.sequenceGaps(ids, "id", bucketSize = 10L)
      .orderBy("gap_start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((9L, 11L), (20L, 40L)))
    // contiguous input → no gaps at all
    assert(Analytics.sequenceGaps((100L to 120L).toDF("id"), "id", 10L)
      .count() === 0L)
  }

  test("benfordProfile: integer digit extraction incl. power-of-ten boundaries; Gini extremes") {
    import spark.implicits._
    // 1000 is the classic float-log10 trap (log10(1000) computing as
    // 2.9999… would floor to digit 10); 999 → 9, 0.5/0/null excluded
    val df = Seq(Some(1000.0), Some(999.0), Some(1.0), Some(25.5),
      Some(0.5), Some(0.0), Option.empty[Double]).toDF("v")
    val out = Analytics.benfordProfile(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(1 -> 2L, 9 -> 1L, 2 -> 1L))
    // Gini: perfect equality → 0; total concentration → (n−1)/n
    val eq = (1L to 4L).map(i => (i, 10.0)).toDF("id", "v")
    val gEq = Analytics.gini(eq, "v", "id").collect().head.getDouble(2)
    assert(math.abs(gEq) < 1e-12)
    val conc = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0))
      .toDF("id", "v")
    val gC = Analytics.gini(conc, "v", "id").collect().head.getDouble(2)
    assert(math.abs(gC - 0.75) < 1e-12) // (n−1)/n with n = 4
  }

  test("changepoint: CUSUM peaks at the level shift, tie to earliest day") {
    import spark.implicits._
    // 1,1,1 then 5,5,5: mean 3, cusum −2,−4,−6,−4,−2,0 → peak |−6| at
    // day 3, the last day of the first regime
    val rows = (1 to 6).map(i =>
      ("a", f"2024-01-0$i%d", if (i <= 3) 1.0 else 5.0))
      .toDF("k", "d", "v")
      .withColumn("ts", concat(col("d"), lit(" 09:00:00")).cast("timestamp"))
    val out = Analytics.changepoint(rows, "k", "ts", "v").collect().head
    assert(out.getDate(1).toString === "2024-01-03")
    assert(out.getDouble(2) === -6.0)
  }

  test("mannKendall/theilSen: hand-computed monotone series, outlier robustness") {
    import spark.implicits._
    // key a: strictly rising 1,2,3,4 → S = 6 (all pairs +), tau = 1
    // key b: 1,2,100,4 — the outlier: MK S = +4 −... pairs:
    //   (1,2)+ (1,100)+ (1,4)+ (2,100)+ (2,4)+ (100,4)− → S = 4
    //   Theil–Sen slopes: [1, 49.5, 1, 98, 1, −96] sorted →
    //   [−96, 1, 1, 1, 49.5, 98], median rank (6+1)//2 = 3 → 1.0
    //   (least squares would be dragged far off 1)
    val rows = Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 3.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-01-01", 1.0), ("b", "2024-01-02", 2.0),
      ("b", "2024-01-03", 100.0), ("b", "2024-01-04", 4.0)
    ).toDF("k", "ts", "v")
      .withColumn("ts", concat(col("ts"), lit(" 09:00:00")).cast("timestamp"))
    val mk = Analytics.mannKendallTrend(rows, "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(mk("a") === ((4L, 6L, 1.0)))
    assert(mk("b") === ((4L, 4L, 4.0 / 6.0)))
    val tsn = Analytics.theilSenTrend(rows, "k", "ts", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(tsn("a") === 1.0)
    assert(tsn("b") === 1.0, "median slope must shrug off the outlier")
  }

  test("holtSmooth: hand-computed level/trend recurrence and forecast") {
    import spark.implicits._
    val rows = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 30.0)
    ).toDF("k", "ts", "v")
      .withColumn("ts", concat(col("ts"), lit(" 09:00:00")).cast("timestamp"))
    val out = Analytics.holtSmooth(rows, "k", "ts", "v", 0.5, 0.5)
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // t1: s=10, b=0, f=10
    // t2: s = 20*.5 + (10+0)*.5 = 15; b = (15−10)*.5 + 0*.5 = 2.5; f=17.5
    // t3: s = 30*.5 + 17.5*.5 = 23.75; b = (23.75−15)*.5 + 2.5*.5 = 5.625
    assert(out(0) === ((10.0, 0.0, 10.0)))
    assert(out(1) === ((15.0, 2.5, 17.5)))
    assert(out(2) === ((23.75, 5.625, 29.375)))
  }

  test("eventPattern: contiguity matters, non-overlapping matches, tie order by id") {
    import spark.implicits._
    def ev(u: Long, ts: String, id: Long, t: String) = (u, ts, id, t)
    val df = Seq(
      // user 1: click view view purchase → ONE match spanning all 4
      ev(1L, "2024-01-01 10:00:00", 1, "click"),
      ev(1L, "2024-01-01 10:01:00", 2, "view"),
      ev(1L, "2024-01-01 10:02:00", 3, "view"),
      ev(1L, "2024-01-01 10:03:00", 4, "purchase"),
      // user 2: click ERROR purchase — contiguity broken ⇒ NO match
      // (an EXISTS-chain funnel would count this user)
      ev(2L, "2024-01-01 10:00:00", 5, "click"),
      ev(2L, "2024-01-01 10:01:00", 6, "error"),
      ev(2L, "2024-01-01 10:02:00", 7, "purchase"),
      // user 3: two disjoint click,purchase runs ⇒ 2 matches
      ev(3L, "2024-01-01 10:00:00", 8, "click"),
      ev(3L, "2024-01-01 10:01:00", 9, "purchase"),
      ev(3L, "2024-01-01 10:02:00", 10, "click"),
      ev(3L, "2024-01-01 10:03:00", 11, "purchase"),
      // user 4: same-timestamp tie — id order decides (click before
      // purchase ⇒ match)
      ev(4L, "2024-01-01 10:00:00", 12, "click"),
      ev(4L, "2024-01-01 10:00:00", 13, "purchase"),
      // user 5: a NULL-TYPE event between click and purchase is a real
      // event in a real position — it must BREAK contiguity, not be
      // silently skipped into a fabricated match
      ev(5L, "2024-01-01 10:00:00", 14, "click"),
      ev(5L, "2024-01-01 10:01:00", 15, null),
      ev(5L, "2024-01-01 10:02:00", 16, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.eventPattern(df, "user_id", "ts", "event_id",
        "event_type", "click,(view,)*purchase,")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) === ((4L, 1, "click,view,view,purchase,")))
    assert(!out.contains(2L))
    assert(out(3L) === ((4L, 2, "click,purchase,")))
    assert(out(4L) === ((2L, 1, "click,purchase,")))
    assert(!out.contains(5L), "null-type event must break contiguity")
  }

  test("psiDrift: identical distributions read 0, a full shift reads large, ref-unknown keys dropped") {
    import spark.implicits._
    val ref = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))
    val curSame = (1 to 100).map(i => ("a", i.toDouble))
    val curShift = (1 to 100).map(i => ("a", 1000.0 + i)) ++
      (1 to 30).map(i => ("zzz_new_key", i.toDouble))
    val refDf = ref.toDF("k", "v")
    val same = Analytics.psiDrift(refDf, curSame.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // identical per-bucket counts ⇒ every term is exactly (p−p)·ln(1) = 0
    assert(same("a") === 0.0)
    // key b has NO current rows: Laplace smoothing makes the empty
    // sample read as uniform — and uniform over the reference's OWN
    // deciles is exactly the reference distribution, so PSI is 0 (an
    // absent sample carries no drift evidence; count it via n_cur)
    assert(same("b") === 0.0)
    assert(same.size === 2)
    val shiftedRows = Analytics
      .psiDrift(refDf, curShift.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // everything lands above the top reference cut — massive drift
    assert(shiftedRows("a")._3.get > 1.0,
      s"expected large PSI, got ${shiftedRows("a")}")
    // keys unknown to the reference have no cuts to bucket against —
    // but "everything is new" is the strongest drift signal, so the
    // key surfaces with n_ref = 0 and a NULL psi instead of vanishing
    assert(shiftedRows("zzz_new_key") === ((0L, 30L, None)))
  }

  test("kCore: pendant chain peels away, core degrees are in-core, loud non-convergence") {
    import spark.implicits._
    // K4 {0,1,2,3} with a pendant path 3-10-11-12: the 2-core is the
    // K4 alone (the path peels one layer per synchronous round —
    // 3 rounds), and 3's core degree drops from 4 to 3 once 10 leaves
    val edges = (for { a <- 0 to 3; b <- 0 to 3 if a < b }
      yield (a.toLong, b.toLong)) ++ Seq((3L, 10L), (10L, 11L), (11L, 12L))
    val out = Analytics.kCore(edges.toDF("a", "b"), "a", "b", k = 2,
        rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k above the max degree → empty core, still converges
    assert(Analytics.kCore(edges.toDF("a", "b"), "a", "b", k = 10,
      rounds = 10).count() === 0L)
    // a too-small round cap fails loudly instead of returning a
    // not-yet-fixpoint survivor set
    val chain = (0L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalArgumentException] {
      Analytics.kCore(chain.toDF("a", "b"), "a", "b", k = 2, rounds = 2)
    }
  }

  test("labelPropagation: two cliques with a bridge split into two communities (CC would merge them)") {
    import spark.implicits._
    def clique(base: Long, n: Int) = for {
      a <- 0 until n; b <- 0 until n if a < b
    } yield (base + a, base + b)
    // cliques {0..3} and {10..13} joined by ONE bridge 3-10
    val edges = (clique(0, 4) ++ clique(10, 4) ++ Seq((3L, 10L)))
      .toDF("a", "b")
    val out = Analytics.labelPropagation(edges, "a", "b", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 from identity labels: clique members adopt min clique
    // label; later rounds are stable (0 resp. 10 dominate each
    // neighborhood, bridge votes 1 vs 3 within-clique votes)
    (0L to 3L).foreach(i => assert(out(i) === 0L, s"node $i"))
    (10L to 13L).foreach(i => assert(out(i) === 10L, s"node $i"))
    // connected components on the same graph yields ONE label — LPA's
    // density split is the point of the operator
    val cc = graft.operators.Dedup.nearDupComponents(
        edges.select(col("a").as("id")).unionAll(edges.select(col("b").as("id")))
          .distinct(), "id",
        edges.select(col("a").as("id_a"), col("b").as("id_b")))
      .collect().map(_.getLong(1)).distinct
    assert(cc.length === 1)
  }

  test("labelPropagation: deterministic min-label tie-break, zero iterations = identity") {
    import spark.implicits._
    // triangle: every node sees two neighbors with distinct labels
    // (one vote each) — ties MUST break to the smaller label
    val tri = Seq((5L, 7L), (7L, 9L), (5L, 9L)).toDF("a", "b")
    val r1 = Analytics.labelPropagation(tri, "a", "b", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(5L -> 7L, 7L -> 5L, 9L -> 5L))
    val r0 = Analytics.labelPropagation(tri, "a", "b", iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 === Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
  }

  test("touchAttribution: first/last picks, lookback cut, direct conversions, other users excluded") {
    import spark.implicits._
    val df = Seq(
      // user 1: click(1) → view(2) → purchase(3); an OLD view(0)
      // outside the 7-day lookback must not win first-touch
      (1L, "2024-01-01 10:00:00", "view", 100L),
      (1L, "2024-01-10 09:00:00", "click", 101L),
      (1L, "2024-01-10 10:00:00", "view", 102L),
      (1L, "2024-01-10 11:00:00", "purchase", 103L),
      // user 1 second purchase: the earlier purchase is NOT a touch;
      // last touch is still view(102)
      (1L, "2024-01-10 12:00:00", "purchase", 104L),
      // user 2: direct conversion, no touches → NULL attribution
      (2L, "2024-01-10 11:00:00", "purchase", 200L),
      // user 3's touch must never credit user 2
      (3L, "2024-01-10 10:30:00", "click", 300L)
    ).toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.touchAttribution(df, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("click", "view"), lookbackDays = 7)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)), Option(r.get(5))))).toMap
    assert(out(103L) === ((Some(101L), Some(102L)))) // first=click, last=view
    assert(out(104L) === ((Some(101L), Some(102L)))) // purchase 103 not a touch
    assert(out(200L) === ((None, None)))             // direct
  }

  test("ewmaSmooth: hand-computed recurrence, keys independent, multi-row days summed") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01 09:00:00", 4.0), ("a", "2024-01-01 10:00:00", 6.0),
      ("a", "2024-01-02 09:00:00", 20.0), ("a", "2024-01-03 09:00:00", 40.0),
      ("a", "2024-01-04 09:00:00", 0.0),
      ("b", "2024-01-01 09:00:00", 100.0), ("b", "2024-01-03 09:00:00", 50.0)
    ).toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.ewmaSmooth(df, "k", "ts", "v", alpha = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    // a: daily 10 (4+6), 20, 40, 0 → ewma 10, 15, 27.5, 13.75
    assert(out(("a", "2024-01-01")) === ((10.0, 10.0)))
    assert(out(("a", "2024-01-02")) === ((20.0, 15.0)))
    assert(out(("a", "2024-01-03")) === ((40.0, 27.5)))
    assert(out(("a", "2024-01-04")) === ((0.0, 13.75)))
    // b: independent chain; missing days are skipped, not zero-filled
    assert(out(("b", "2024-01-01")) === ((100.0, 100.0)))
    assert(out(("b", "2024-01-03")) === ((50.0, 75.0)))
  }

  test("countAnomalyScore: trailing median, full-window eligibility, spike ranks high") {
    import spark.implicits._
    // key a: counts 1, 1, 2, 8 per day (spike on day 4); lookback 2 ⇒
    // day 3 eligible (tr [1,1], median 1, score 2), day 4 (tr [1,2],
    // lower median 1, score 8)
    val rows =
      Seq.fill(1)(("a", "2024-01-01 09:00:00")) ++
      Seq.fill(1)(("a", "2024-01-02 09:00:00")) ++
      Seq.fill(2)(("a", "2024-01-03 09:00:00")) ++
      Seq.fill(8)(("a", "2024-01-04 09:00:00"))
    val df = rows.toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.countAnomalyScore(df, "k", "ts", lookback = 2)
      .collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set("2024-01-03", "2024-01-04"))
    assert(out("2024-01-03") === ((2L, 1L, 2.0)))
    assert(out("2024-01-04") === ((8L, 1L, 8.0)))
  }

  test("hopDistance: min hops, cap, early exit, isolated seed, unreachable absent") {
    import spark.implicits._
    // path 1-2-3-4-5 plus shortcut 1-4 (4 is 1 hop via the shortcut,
    // not 3; 5 rides it to 2), seed 1; 9-10 is a disconnected edge
    // (unreachable); 7 is an isolated seed (no edges at all)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("a", "b")
    val seeds = Seq(1L, 7L).toDF("node")
    val out = Analytics.hopDistance(edges, "a", "b", seeds, "node", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 7L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))

    // cap: maxHops = 1 stops the expansion after one round
    val capped = Analytics.hopDistance(edges, "a", "b",
        Seq(1L).toDF("node"), "node", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped === Map(1L -> 0, 2L -> 1, 4L -> 1))

    // maxHops = 0: seeds only
    val zero = Analytics.hopDistance(edges, "a", "b",
        Seq(1L).toDF("node"), "node", maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(zero === Map(1L -> 0))
  }

  test("seasonalProfile: ISO weekdays, daily totals first, index vs grand mean") {
    // two Monday DAYS (one split into two events — must total per day
    // BEFORE averaging), one Tuesday, one Sunday; grand daily mean 25
    val events = Seq(
      ("2026-08-03 09:00:00", 4.0), ("2026-08-03 17:00:00", 6.0),
      ("2026-08-10 12:00:00", 20.0),
      ("2026-08-04 08:00:00", 30.0),
      ("2026-08-09 23:00:00", 40.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    val got = Analytics.seasonalProfile(events, "ts", "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set(1, 2, 7)) // Mon, Tue, Sun — ISO numbering
    assert(got(1) === ((2L, 30.0, 15.0, 15.0 / 25.0)))
    assert(got(2) === ((1L, 30.0, 30.0, 30.0 / 25.0)))
    assert(got(7) === ((1L, 40.0, 40.0, 40.0 / 25.0)))
  }
}
