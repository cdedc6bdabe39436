package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scale, Similarity}

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals the naive grouping result") {
    val ev = Tables.events(spark, sf)
    val salted = Scale.saltedSum(ev, Seq("event_type"), "value",
        "total", saltFrom = "event_id", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val naive = ev.groupBy("event_type").agg(sum("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === naive.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - naive(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }

  test("modSample keeps exactly ids with id % den < num") {
    val s = Scale.modSample(Tables.events(spark, sf), "event_id", 2, 10)
      .select("event_id").collect().map(_.getLong(0))
    assert(s.nonEmpty)
    assert(s.forall(id => id % 10 < 2))
  }

  test("hashSample is deterministic and roughly proportional") {
    val df = Tables.events(spark, sf)
    val a = Scale.hashSample(df, "event_id", 3, 10).count()
    val b = Scale.hashSample(df, "event_id", 3, 10).count()
    assert(a === b)
    val total = df.count()
    assert(a > total * 0.2 && a < total * 0.4) // ~30% ± slack
  }

  test("stratifiedModSample applies per-stratum rates with a default") {
    val df = Tables.events(spark, sf)
    val out = Scale.stratifiedModSample(df, "event_type", "event_id",
      rates = Map("purchase" -> ((1, 2)), "view" -> ((1, 10))),
      defaultRate = (1, 20))
    // per-stratum, the output must equal modSample at that stratum's rate
    def ids(d: org.apache.spark.sql.DataFrame, et: String) =
      d.filter(col("event_type") === et).select("event_id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(out, "purchase") ===
      ids(Scale.modSample(df, "event_id", 1, 2), "purchase"))
    assert(ids(out, "view") ===
      ids(Scale.modSample(df, "event_id", 1, 10), "view"))
    assert(ids(out, "click") ===
      ids(Scale.modSample(df, "event_id", 1, 20), "click")) // default rate
    // no shuffle: the plan is scan + filter only
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stratified sample must not shuffle")
  }

  test("headCapRates: rate = min(1, c/sqrt(n)) per group") {
    // 100 rows of "big", 4 of "small", 2 with NULL group
    val rows = (0L until 100L).map(i => (i, "big")) ++
      (100L until 104L).map(i => (i, "small")) ++
      Seq((104L, null: String), (105L, null: String))
    val df = rows.toDF("id", "g")
    val rates = Scale.headCapRates(df, "g", c = 5.0)
      .collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rates(Some("big")) === ((100L, 0.5)))     // 5/sqrt(100)
    assert(rates(Some("small")) === ((4L, 1.0)))      // capped at 1
    assert(rates(None) === ((2L, 1.0)))               // NULL group counted too
  }

  test("headCapSample: head group damped by threshold, tail and NULL groups intact") {
    val rows = (0L until 100L).map(i => (i, "big")) ++
      (100L until 104L).map(i => (i, "small")) ++
      Seq((104L, null: String), (105L, null: String))
    val df = rows.toDF("id", "g")
    val kept = Scale.headCapSample(df, "g", "id", c = 5.0, den = 100)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    val (big, rest) = kept.partition(_._2.contains("big"))
    // rate(big)=0.5, den=100 → keep ids with id%100 < 50 → exactly 0..49
    assert(big.map(_._1).sorted === (0L until 50L).toArray)
    // rate 1.0 → thresholds = den → everything survives, incl. NULL group
    assert(rest.map(_._1).sorted === (100L to 105L).toArray)
    // output schema unchanged (helper columns dropped)
    assert(Scale.headCapSample(df, "g", "id", c = 5.0).columns === df.columns)
  }

  test("groupQuota keeps the k smallest ids per group, full rows intact") {
    val df = Seq(
      (1L, "a", "x1"), (2L, "a", "x2"), (3L, "a", "x3"),
      (10L, "b", "y1"), (11L, "b", "y2"),
      (20L, "c", "z1")).toDF("id", "grp", "payload")
    val out = Scale.groupQuota(df, "grp", "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set((1L, "a", "x1"), (2L, "a", "x2"),
      (10L, "b", "y1"), (11L, "b", "y2"), (20L, "c", "z1")))
    // plan: the quota side aggregates, it does not window-sort
    val plan = Scale.groupQuota(df, "grp", "id", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("groupQuota composite key: caps per (group1, group2) cell") {
    val df = Seq(
      (1L, "a", "en"), (2L, "a", "en"), (3L, "a", "en"),
      (4L, "a", "de"), (5L, "a", "de"),
      (6L, "b", "en"), (7L, "b", "en")).toDF("id", "src", "lang")
    val out = Scale.groupQuota(df, Seq("src", "lang"), "id", k = 2)
      .select("id").collect().map(_.getLong(0)).sorted
    // each (src, lang) cell keeps its 2 smallest ids: (a,en)->1,2
    // (a,de)->4,5 (b,en)->6,7 — id 3 is the only casualty
    assert(out === Seq(1L, 2L, 4L, 5L, 6L, 7L))
    // equivalence vs the window oracle formulation on the composite key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), col("lang")).orderBy(col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(out === ref)
  }

  test("groupQuota: NULL group values form their own capped group") {
    val df = Seq(
      (1L, Option("a")), (2L, Option("a")), (3L, Option("a")),
      (4L, None), (5L, None), (6L, None)).toDF("id", "grp")
    val out = Scale.groupQuota(df, "grp", "id", k = 2)
      .select("id").collect().map(_.getLong(0)).sorted
    // the null group is an ordinary partition (row_number semantics):
    // kept ids 4,5 — not silently dropped by null-rejecting equality
    assert(out === Seq(1L, 2L, 4L, 5L))
  }

  test("packSequences: exclusive prefix layout, boundary docs span sequences") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "s1", words(4)),  // start 0,  seq 0, off 0, spans 1
      (2L, "s1", words(5)),  // start 4,  seq 0, off 4, spans 1
      (3L, "s1", words(3)),  // start 9,  seq 0, off 9, spans 2 (cut at 10)
      (4L, "s1", words(9)),  // start 12, seq 1, off 2, spans 2 (ends tok 21)
      (5L, "s2", words(12))) // own shard: start 0, seq 0, off 0, spans 2
      .toDF("doc_id", "source", "text")
    val out = Scale.packSequences(docs, "source", "doc_id",
        graft.functions.TextAnalysis.tokenCount(col("text")), budget = 10)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    // (n_tokens, start_tok, seq_id, seq_offset, n_seqs)
    assert(out === Map(
      1L -> ((4L, 0L, 0L, 0L, 1L)),
      2L -> ((5L, 4L, 0L, 4L, 1L)),
      3L -> ((3L, 9L, 0L, 9L, 2L)),
      4L -> ((9L, 12L, 1L, 2L, 2L)),
      5L -> ((12L, 0L, 0L, 0L, 2L))))
  }

  test("winsorize: approx sketch path tracks the exact path within tolerance") {
    val ev = Tables.events(spark, sf)
    val exact = Scale.winsorize(ev, "event_type", "value", 0.95,
        "clipped", exact = true)
      .select("event_id", "clipped")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Scale.winsorize(ev, "event_type", "value", 0.95,
        "clipped", exact = false)
      .select("event_id", "clipped")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    val worst = exact.map { case (id, e) => math.abs(approx(id) - e) / math.max(e, 1.0) }.max
    assert(worst <= 0.05, s"worst relative clip divergence $worst")
  }

  test("corpusStatsApprox tracks the exact aggregation within tolerance") {
    val docs = Tables.documents(spark, sf)
    val exact = docs.groupBy(col("lang"))
      .agg(percentile(col("n_chars"), lit(0.5)).as("p50"),
        percentile(col("n_chars"), lit(0.95)).as("p95"),
        countDistinct(col("source")).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    val approx = Scale.corpusStatsApprox(docs, "lang", "n_chars", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (lang, (p50, p95, nd)) =>
      val (e50, e95, end) = exact(lang)
      // GK returns an actual data value while exact `percentile`
      // interpolates between the two straddling values, so the gap can
      // be up to one local value spacing even at near-exact accuracy
      assert(math.abs(p50 - e50) <= math.max(10.0, e50 * 0.03), s"$lang p50")
      assert(math.abs(p95 - e95) <= math.max(10.0, e95 * 0.03), s"$lang p95")
      assert(math.abs(nd - end) <= math.max(1.0, end * 0.1), s"$lang distinct")
    }
  }

  test("labelCentroids: per-dimension means over a known fixture") {
    val vecs = Seq(
      (0, Array(1.0f, 3.0f)),
      (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 20.0f))).toDF("label", "embedding")
    val c = Similarity.labelCentroids(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(c === Map((0, 0) -> 2.0, (0, 1) -> 4.0, (1, 0) -> 10.0, (1, 1) -> 20.0))
  }

  test("leakageSafeSplit keeps whole near-dup components in one split") {
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // transitive cluster {7, 121, 205} plus pair {30, 31}
    val pairs = Seq((7L, 205L), (205L, 121L), (30L, 31L)).toDF("id_a", "id_b")
    val out = Scale.leakageSafeSplit(docs, "doc_id", pairs)
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(m.size === 300)
    // the cluster shares component 7 → everyone lands in 7's split
    assert(m(7L) === ((7L, "train")))
    assert(m(121L) === ((7L, "train")))
    assert(m(205L) === ((7L, "train")))
    assert(m(30L) === ((30L, "train")) && m(31L) === ((30L, "train")))
    // singletons split by their own id mod 100: 80..89 val, 90..99 test
    assert(m(85L) === ((85L, "val")))
    assert(m(185L) === ((185L, "val")))
    assert(m(99L) === ((99L, "test")))
    assert(m(42L) === ((42L, "train")))
    // every near-dup pair's endpoints agree on the split — the whole
    // point of the operator
    Seq(7L -> 205L, 205L -> 121L, 30L -> 31L).foreach { case (a, b) =>
      assert(m(a)._2 === m(b)._2)
    }
  }

  test("rankBins exact: ntile sizes, bin monotonicity, rank endpoints") {
    val df = (1L to 20L).map(i => (i, (i * 7 % 20).toDouble)).toDF("id", "v")
    val out = Scale.rankBins(df, "v", "id", nBins = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getDouble(3)))
    assert(out.length === 20)
    // 20 rows / 4 bins: exactly 5 per bin (ntile leading-bucket rule)
    assert(out.groupBy(_._3).view.mapValues(_.length).toMap ===
      Map(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 5))
    // bins are monotone in the (v, id) order; pct_rank spans [0, 1]
    val sorted = out.sortBy(r => (r._2, r._1))
    assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
    assert(sorted.head._4 === 0.0 && sorted.last._4 === 1.0)
  }

  test("rankBins approx: within one bin of exact on the fixture") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("double").as("v"))
    val exact = Scale.rankBins(docs, "v", "doc_id", nBins = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val approx = Scale.rankBins(docs, "v", "doc_id", nBins = 10, exact = false)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(approx.keySet === exact.keySet)
    val off = approx.count { case (id, b) => math.abs(b - exact(id)) > 1 }
    assert(off === 0, s"$off rows more than one bin from exact")
  }

  test("shardManifest: counts, token totals, and id ranges per mod shard") {
    val df = Seq((0L, "a b"), (1L, "c"), (16L, "d e f"), (17L, ""))
      .toDF("doc_id", "text")
    val m = Scale.shardManifest(df, "doc_id", 16,
        graft.functions.TextAnalysis.tokenCount(col("text")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // shard 0: docs 0, 16 — 2 + 3 tokens; shard 1: docs 1, 17 — the
    // empty doc counts 1 token (the [''] split quirk, same both engines)
    assert(m === Map(0L -> ((2L, 5L, 0L, 16L)), 1L -> ((2L, 2L, 1L, 17L))))
  }

  test("upsample: integer copies, deterministic fractional cut, zero drops") {
    val df = (0L until 20L).map(i => (i, if (i < 10) "a" else "b"))
      .toDF("id", "g")
    val out = Scale.upsample(df, "g", "id",
        Map("a" -> 2.5, "b" -> 0.0), defaultWeight = 1.0, den = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.forall(_._2 == "a"), "weight-0 group must drop entirely")
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // ids 0-4 (id%10 < 5): 3 copies with rep 0,1,2; ids 5-9: 2 copies
    (0L to 4L).foreach(i => assert(byId(i) === Seq(0L, 1L, 2L)))
    (5L to 9L).foreach(i => assert(byId(i) === Seq(0L, 1L)))
    // defaultWeight 1.0 is the identity: one copy, rep 0
    val ident = Scale.upsample(df, "g", "id", Map.empty, defaultWeight = 1.0)
    assert(ident.count() === 20)
    assert(ident.select("rep").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
    // fractional-only weight is plain deterministic downsampling
    val frac = Scale.upsample(df, "g", "id", Map("a" -> 0.5, "b" -> 0.5),
        den = 10)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(frac === Array(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 14L))
  }

  test("leakageSafeSplit rejects impossible percent boundaries") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Scale.leakageSafeSplit(docs, "doc_id", pairs, trainPct = 95, valPct = 10)
    }
  }

  test("groupQuantiles: discrete positions, ties, nulls dropped, p=1 is max") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(4.0)),
      ("a", None), // null never a quantile
      ("b", Some(7.0)), // singleton: every p → 7
      ("c", Some(5.0)), ("c", Some(5.0)), ("c", Some(9.0)) // ties
    ).toDF("g", "v")
    val out = Scale.groupQuantiles(df, "g", "v", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // "a": n=4, ceil(.5*4)=2 → 2.0; ceil(1*4)=4 → 4.0
    // "c": n=3, ceil(.5*3)=2 → 5.0 (tie position is value-invariant)
    assert(out === Map(
      ("a", 0.5) -> 2.0, ("a", 1.0) -> 4.0,
      ("b", 0.5) -> 7.0, ("b", 1.0) -> 7.0,
      ("c", 0.5) -> 5.0, ("c", 1.0) -> 9.0))
  }

  test("madOutliers: planted spike flagged, tight cluster untouched") {
    val rows = (1L to 9L).map(i => (i, "g", 100.0 + i)) :+ ((99L, "g", 10000.0))
    val out = Scale.madOutliers(rows.toDF("id", "g", "v"), "g", "v", "id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(99L))
    // center is the discrete median of 101..109,10000 → 105 (pos ceil(5)=5)
    assert(out.head.getDouble(3) === 105.0)
    // no outliers at all in a uniform group
    val none = Scale.madOutliers(
      (1L to 10L).map(i => (i, "g", 50.0)).toDF("id", "g", "v"), "g", "v", "id")
    assert(none.count() === 0L)
  }

  test("histogram: bin boundaries, max in last bin, degenerate column") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val out = Scale.histogram(df, "v", nBins = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // [0,100] in 10 bins: 0..9 → bin0 .. 90..99 → bin9 plus 100 clamped
    assert(out.keySet === (0L to 9L).toSet)
    assert(out(0L) === ((0.0, 10L)))
    assert(out(9L) === ((90.0, 11L))) // 90..99 and the clamped max
    val deg = Scale.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 4).collect()
    assert(deg.length === 1 && deg.head.getLong(0) === 0L &&
      deg.head.getLong(2) === 3L)
  }

  test("profileColumns: null and exact distinct counts in one pass") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None), (Some(2L), Some("y")),
      (None, Some("x"))
    ).toDF("id", "s")
    val out = Scale.profileColumns(df, Seq("id", "s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      "id" -> ((4L, 1L, 2L)),
      "s" -> ((4L, 1L, 2L))))
  }

  test("keySummary/mergeSummaries: merged batches equal the from-scratch scan") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(-2.0)), ("b", Some(8.0)), ("c", Some(5.0))
    ).toDF("k", "v")
    // any split must merge to the same summary, including one where a
    // key lives entirely on one side ("c") and one side is empty for it
    val left = Scale.keySummary(df.limit(3), "k", "v")
    val right = Scale.keySummary(df.except(df.limit(3)), "k", "v")
    val merged = Scale.finishSummary(Scale.mergeSummaries(left, right, "k"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))))
      .toMap
    val scratch = Scale.finishSummary(Scale.keySummary(df, "k", "v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))))
      .toMap
    assert(merged === scratch)
    assert(scratch("a") === ((4.0, 2L, 1.0, 3.0, 2.0))) // null v excluded
    assert(scratch("b") === ((6.0, 2L, -2.0, 8.0, 3.0)))
    assert(scratch("c") === ((5.0, 1L, 5.0, 5.0, 5.0)))
  }

  test("uniformGroupSample: k per group by sha rank, deterministic, seeded") {
    val df = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Scale.uniformGroupSample(df, "grp", "id", k = 5)
      .collect().map(_.getLong(0)).sorted
    assert(s1.length === 10) // 5 per group
    // deterministic: same call, same sample
    val s2 = Scale.uniformGroupSample(df, "grp", "id", k = 5)
      .collect().map(_.getLong(0)).sorted
    assert(s1 === s2)
    // NOT the min-id sample (that's groupQuota's policy) — a hash rank
    // almost surely picks a different set than ids 1-5/21-25
    assert(s1.toSeq !== (1L to 5L) ++ (21L to 25L))
    // a different seed re-draws
    val s3 = Scale.uniformGroupSample(df, "grp", "id", k = 5, seed = "v2")
      .collect().map(_.getLong(0)).sorted
    assert(s1 !== s3)
    // matches the window-rank reference formulation exactly
    val rank = conv(substring(sha2(col("id").cast("string"), 256), 1, 13),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(rank, col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).collect().map(_.getLong(0)).sorted
    assert(s1 === ref)
    // k >= group size keeps everything
    assert(Scale.uniformGroupSample(df, "grp", "id", 50).count() === 40)
  }

  test("globalRank: dense 1..N by (val, id), ≡ single-window reference") {
    val rnd = new scala.util.Random(23)
    // heavy duplication so value ties straddle bucket cuts
    val df = (1L to 500L).map(i => (i, rnd.nextInt(20).toDouble)).toDF("id", "v")
    val got = Scale.globalRank(df, "v", "id", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ref = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === ref)
    // null values carry no rank
    val withNull = Seq((1L, Some(1.0)), (2L, Option.empty[Double])).toDF("id", "v")
    assert(Scale.globalRank(withNull, "v", "id").count() === 1)
    // buckets = 1 degenerates to the plain total order
    assert(Scale.globalRank(df, "v", "id", buckets = 1).count() === 500)
  }

  test("quantileNormalize: shifted source maps onto the global distribution") {
    // source a: values 1-10; source b: 101-110 — after normalization
    // each source's values are the global values at its own quantile
    // positions: a's k-th of 10 → global position ceil(k*20/10) = 2k
    val df = ((1L to 10L).map(i => (i, "a", i.toDouble)) ++
      (11L to 20L).map(i => (i, "b", (i + 90).toDouble))).toDF("id", "src", "v")
    val out = Scale.quantileNormalize(df, "src", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val globalSorted = ((1L to 10L).map(_.toDouble) ++
      (101L to 110L).map(_.toDouble)).sorted
    for (k <- 1 to 10) {
      assert(out(k.toLong) === globalSorted(2 * k - 1), s"a's $k-th")
      assert(out((k + 10).toLong) === globalSorted(2 * k - 1), s"b's $k-th")
    }
    // both sources normalize onto the SAME multiset
    assert(out.filterKeys(_ <= 10).values.toSeq.sorted ===
      out.filterKeys(_ > 10).values.toSeq.sorted)
  }

  test("weightedGroupSample: E-S keys, weight bias, bad weights excluded") {
    val df = (1L to 200L).map(i =>
      (i, "g", if (i <= 100) 1.0 else 100.0)).toDF("id", "grp", "w")
    val kept = Scale.weightedGroupSample(df, "grp", "id", "w", k = 40)
      .collect().map(_.getLong(0)).sorted
    assert(kept.length === 40)
    // 100x weight must dominate: expect the heavy half to take the
    // overwhelming majority of slots (E[light] ≈ 40·(1/101) ≪ 10)
    assert(kept.count(_ > 100L) >= 30, s"heavy rows took ${kept.count(_ > 100L)}/40")
    // deterministic
    assert(Scale.weightedGroupSample(df, "grp", "id", "w", 40)
      .collect().map(_.getLong(0)).sorted === kept)
    // ≡ the window-rank reference with the same key computation
    val u = (conv(substring(sha2(col("id").cast("string"), 256), 1, 13),
      16, 10).cast("double") + lit(1.0)) / lit(4503599627370496.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(pow(u, lit(1.0) / col("w")).desc, col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 40).collect().map(_.getLong(0)).sorted
    assert(kept === ref)
    // null / non-positive weights never sampled
    val bad = Seq((1L, "g", Some(0.0)), (2L, "g", Some(-3.0)),
      (3L, "g", Option.empty[Double]), (4L, "g", Some(2.0))).toDF("id", "grp", "w")
    assert(Scale.weightedGroupSample(bad, "grp", "id", "w", 10)
      .collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("kAnonymize: small quasi groups suppressed, null quasi is a group") {
    val df = Seq(
      (1L, "en", "s1"), (2L, "en", "s1"), (3L, "en", "s1"), // size 3: kept
      (4L, "en", "s2"), (5L, "en", "s2"),                   // size 2: dropped
      (6L, "fr", "s1"),                                     // size 1: dropped
      (7L, null, "s1"), (8L, null, "s1"), (9L, null, "s1")  // NULL lang: a
        // real group of 3 — kept, not silently discarded
    ).toDF("id", "lang", "src")
    val kept = Scale.kAnonymize(df, Seq("lang", "src"), k = 3)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept === Seq(1L, 2L, 3L, 7L, 8L, 9L))
    // k=1 keeps everything; k larger than any group keeps nothing
    assert(Scale.kAnonymize(df, Seq("lang", "src"), 1).count() === 9)
    assert(Scale.kAnonymize(df, Seq("lang", "src"), 4).count() === 0)
    // output schema is the input schema (a suppression, not a projection)
    assert(Scale.kAnonymize(df, Seq("lang", "src"), 3).columns.toSeq
      === df.columns.toSeq)
  }

  test("temperatureRates: p^α normalization flattens the head, α=1 is identity") {
    import spark.implicits._
    // 80 / 16 / 4 rows → p = 0.8 / 0.16 / 0.04
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (1 to 16).map(i => (i.toLong, "mid")) ++
      (1 to 4).map(i => (i.toLong, "small"))).toDF("id", "g")

    def rates(q: Int): Map[String, (Long, Double, Double)] =
      Scale.temperatureRates(df, "g", alphaQuarters = q).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap

    val full = rates(4) // α = 1: p_temp ≡ p
    assert(full("big") === ((80L, 0.8, 0.8)))
    assert(full("small")._3 === 0.04)

    val sqrtT = rates(2) // α = 1/2: exact sqrt arithmetic
    val z = math.sqrt(0.8) + math.sqrt(0.16) + math.sqrt(0.04)
    assert(math.abs(sqrtT("big")._3 - math.sqrt(0.8) / z) < 1e-15)
    assert(math.abs(sqrtT("small")._3 - math.sqrt(0.04) / z) < 1e-15)

    // flattening is monotone in temperature: the head's share shrinks
    // and the tail's grows as α drops 1 → 1/4, distribution stays ~1
    val shares = Seq(4, 3, 2, 1).map(q => rates(q))
    assert(shares.map(_("big")._3).sliding(2).forall { case Seq(a, b) => b < a })
    assert(shares.map(_("small")._3).sliding(2).forall { case Seq(a, b) => b > a })
    shares.foreach(s => assert(math.abs(s.values.map(_._3).sum - 1.0) < 1e-12))
    // quarter chain matches the real power function to double precision
    val q3 = rates(3)
    val z3 = Seq(0.8, 0.16, 0.04).map(p => math.pow(p, 0.75)).sum
    assert(math.abs(q3("mid")._3 - math.pow(0.16, 0.75) / z3) < 1e-12)
  }

  test("temperatureRates rejects alpha outside the quarter grid") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "g")
    intercept[IllegalArgumentException](Scale.temperatureRates(df, "g", 0))
    intercept[IllegalArgumentException](Scale.temperatureRates(df, "g", 5))
  }

  test("exactRankSelect: exact order statistics through the recursion path, duplicates, edges") {
    import spark.implicits._
    // deterministic pseudo-random values with heavy duplication (mod
    // 97 over 5000 rows ⇒ every value ~50×), threshold 64 forces
    // multiple quickselect rounds through the eq-pinning branch
    val data = (1 to 5000).map(i => ((i.toLong * 2654435761L) % 97L).toDouble)
    val sorted = data.sorted
    val df = data.toDF("v").repartition(7)
    val ranks = Seq(1L, 2500L, 4999L, 5000L)
    val got = Scale.exactRankSelect(df, "v", ranks, localThreshold = 64)
    ranks.foreach(r =>
      assert(got(r) === sorted(r.toInt - 1), s"rank $r"))
    // nulls are excluded before ranking
    val withNulls = (data.map(Option(_)) ++ Seq.fill(100)(Option.empty[Double]))
      .toDF("v")
    assert(Scale.exactRankSelect(withNulls, "v", Seq(5000L),
      localThreshold = 64)(5000L) === sorted.last)
    // out-of-range ranks fail loudly
    intercept[IllegalArgumentException](
      Scale.exactRankSelect(df, "v", Seq(0L)))
    intercept[IllegalArgumentException](
      Scale.exactRankSelect(df, "v", Seq(5001L)))
  }

  test("exactRankSelect shares pivot rounds across ranks (multi-select)") {
    import spark.implicits._
    val data = (1 to 5000).map(i => ((i.toLong * 2654435761L) % 997L).toDouble)
    val sorted = data.sorted
    val df = data.toDF("v").repartition(7)
    val ranks = Seq(1250L, 2500L, 3750L)
    val got = Scale.exactRankSelect(df, "v", ranks, localThreshold = 16)
    val multiRounds = Scale.lastSelectRounds.get()
    ranks.foreach(r => assert(got(r) === sorted(r.toInt - 1)))
    val singleRounds = ranks.map { r =>
      assert(Scale.exactRankSelect(df, "v", Seq(r),
        localThreshold = 16)(r) === sorted(r.toInt - 1))
      Scale.lastSelectRounds.get()
    }
    // every rank starts in ONE shared frame: the three selections must
    // cost strictly fewer rounds than running them separately
    assert(multiRounds > 0 && multiRounds < singleRounds.sum,
      s"multi=$multiRounds singles=$singleRounds")
  }

  test("trimmedMean: exact rank cuts, boundary-tie neutrality, tiny groups") {
    import spark.implicits._
    // group a: 10 values, 10% trim drops min (0) and max (1000)
    val a = (Seq(0.0, 1000.0) ++ (1 to 8).map(_.toDouble)).map(("a", _))
    // group b: 5 values → cut = floor(5/10) = 0, nothing trimmed
    val b = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("b", _))
    // group c: duplicate values straddling the cut — answer unchanged
    // whichever tied copy the rank order keeps
    val c = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 9.0, 9.0, 9.0)
      .map(("c", _))
    val got = Scale.trimmedMean((a ++ b ++ c).toDF("g", "v"), "g", "v",
        trimTenths = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a") === ((10L, 8L, (1 to 8).sum / 8.0)))
    assert(got("b") === ((5L, 5L, 3.0)))
    // c: n=12, cut=1 → drop one 1.0 and one 9.0 (ties value-neutral)
    assert(got("c") === ((12L, 10L,
      (1.0 + 1.0 + 2 + 3 + 4 + 5 + 6 + 7 + 9 + 9) / 10.0)))
  }

  test("tokenBudgetPlan: exact integer targets, epochs, weight-join semantics") {
    import spark.implicits._
    val docs = Seq(
      ("a", "one two three"), ("a", "four five"), // a: 5 tokens
      ("b", "x y z w"),                           // b: 4 tokens
      ("b", "   "), ("b", null.asInstanceOf[String]), // blank/null excluded
      ("c", "only tokens here")                   // c: unweighted → dropped
    ).toDF("source", "text")
    val weights = Seq(("a", 3L), ("b", 1L), ("d", 6L)).toDF("source", "w_parts")
    val got = Scale.tokenBudgetPlan(docs, "source", "text", weights,
        budgetTokens = 1001L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // Σparts = 10 INCLUDING the corpus-absent source d (its share of
    // the budget is reserved, not redistributed); floor division.
    // epochs_micro = target·10⁶ DIV n_tokens (pure BIGINT, hash-stable)
    assert(got.keySet === Set("a", "b")) // c unweighted, d has no corpus
    assert(got("a") === ((5L, 3L, 300L, 300L * 1000000L / 5)))
    assert(got("b") === ((4L, 1L, 100L, 100L * 1000000L / 4)))
  }

  test("tClosenessProfile ≡ driver TVD over the FULL domain; edge groups") {
    // group g1: matches the global mix exactly -> tvd 0;
    // group g2: homogeneous (all 'x') -> large tvd
    // global mix 16x:4y = 4:1; g1 matches it exactly, g2 is
    // homogeneous, g3 is y-heavy (and carries the excluded null)
    val rows = Seq.fill(8)(("g1", "x")) ++ Seq.fill(2)(("g1", "y")) ++
      Seq.fill(6)(("g2", "x")) ++
      Seq.fill(2)(("g3", "x")) ++ Seq.fill(2)(("g3", "y")) ++
      Seq(("g3", null))
    val df = rows.toDF("grp", "v")
    val got = Scale.tClosenessProfile(df, Seq("grp"), "v", t = 0.1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // driver reference: TVD over the full sensitive domain, absent
    // values included — validates the group-present restatement
    val clean = rows.filter(_._2 != null)
    val n = clean.size.toDouble
    val global = clean.groupBy(_._2).view.mapValues(_.size / n).toMap
    def tvd(g: String): Double = {
      val mem = clean.filter(_._1 == g)
      val p = mem.groupBy(_._2).view.mapValues(_.size.toDouble / mem.size).toMap
      global.keySet.union(p.keySet).toSeq
        .map(v => math.abs(p.getOrElse(v, 0.0) - global.getOrElse(v, 0.0)))
        .sum / 2
    }
    for (g <- Seq("g1", "g2", "g3")) {
      assert(math.abs(got(g)._2 - tvd(g)) < 1e-12, s"group $g")
      assert(got(g)._3 === (tvd(g) <= 0.1), s"close flag $g")
    }
    assert(got("g1")._2 === 0.0) // proportional group
    assert(got("g2")._2 > 0.1) // homogeneous group fails the gate
    assert(got("g3")._1 === 4L) // null sensitive row excluded from n_rows
  }

  test("lengthBucketBatches ≡ driver reference; batch-size and waste invariants") {
    val docs = (1L to 57L).map(id => (id, Seq.fill(3 + (id % 40).toInt)("t")
      .mkString(" "))).toDF("id", "text")
    val got = Scale.lengthBucketBatches(docs, "id",
        graft.functions.TextAnalysis.tokenCount(col("text")),
        bucketWidth = 8, batchSize = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val ref = (1L to 57L).map(id => (id, 3L + id % 40))
      .groupBy { case (_, tk) => (tk - 1) / 8 }
      .flatMap { case (b, mem) =>
        mem.sortBy(_._1).grouped(4).zipWithIndex.map { case (batch, i) =>
          val ls = batch.map(_._2)
          ((b, i.toLong),
            (batch.size.toLong, ls.min, ls.max, ls.sum,
              ls.max * batch.size - ls.sum))
        }
      }
    assert(got === ref)
    assert(got.values.forall(_._1 <= 4)) // batch cap
    assert(got.keys.groupBy(_._1).values // batch ids dense from 0
      .forall(ks => ks.map(_._2).toSeq.sorted == (0L until ks.size).toSeq))
  }

  test("interleaveOrder: permutation ≡ (pos, source) order; exhausted sources drop out") {
    val docs = (Seq.tabulate(7)(i => (i * 10L, "a")) ++
      Seq.tabulate(3)(i => (i * 10L + 1, "b")) ++
      Seq.tabulate(5)(i => (i * 10L + 2, "c"))).toDF("id", "src")
    val got = Scale.interleaveOrder(docs, "src", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._4).sorted.toSeq === (0L until 15L)) // permutation
    val byOrd = got.sortBy(_._4).map(t => (t._3, t._2)).toSeq
    assert(byOrd === byOrd.sorted) // ordinal order IS (pos, source) order
    // first full cycle hits every source; after b exhausts (pos > 3)
    // only a and c alternate
    assert(byOrd.take(3).map(_._2) === Seq("a", "b", "c"))
    assert(byOrd.filter(_._1 > 3).map(_._2).distinct.sorted === Seq("a", "c"))
    // guard: more sources than maxSources fails loudly
    val many = spark.range(0, 20)
      .select(col("id"), concat(lit("s"), col("id")).as("src"))
    val e = intercept[IllegalArgumentException] {
      Scale.interleaveOrder(many, "src", "id", maxSources = 10)
    }
    assert(e.getMessage.contains("maxSources"))
  }

  test("groupQuotaBest: top-k by score, null scores lose, ≡ window form") {
    import spark.implicits._
    val rows = Seq(
      (1L, "g1", Some(5.0)), (2L, "g1", Some(9.0)), (3L, "g1", Some(9.0)),
      (4L, "g1", None), (5L, "g1", Some(1.0)),
      (6L, "g2", None), (7L, "g2", None), // all-null group: ids decide
      (8L, "g3", Some(2.0)))
    val df = rows.map(t => (t._1, t._2, t._3.map(Double.box).orNull))
      .toDF("id", "grp", "score")
    val kept = Scale.groupQuotaBest(df, "grp", "id", "score", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // g1: 9.0 tie → ids 2,3 (5.0 and null lose); g2: null-only → min
    // ids 6,7; g3: its lone row
    assert(kept === Set(2L, 3L, 6L, 7L, 8L))
    // ≡ window reference on a randomized frame
    val rnd = new scala.util.Random(11)
    val big = (1 to 300).map(i =>
      (i.toLong, s"g${i % 7}", rnd.nextInt(20).toDouble))
      .toDF("id", "grp", "score")
    val got = Scale.groupQuotaBest(big, "grp", "id", "score", k = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id"))
    val want = big.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("curriculumOrder: stage-major, round-robin within stage, ≡ window form") {
    import spark.implicits._
    // bin 1: a×2, b×1; bin 2: a×1, c×2 — stages must not interleave
    val rows = Seq(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "b", 1L),
      (4L, "a", 2L), (5L, "c", 2L), (6L, "c", 2L))
    val df = rows.toDF("id", "src", "bin")
    val got = Scale.curriculumOrder(df, "bin", "src", "id")
      .collect().map(r => r.getAs[Long]("ordinal") ->
        ((r.getAs[Long]("id"), r.getAs[Long]("bin")))).toMap
    // window reference: row_number over (bin, pos, source)
    val want = rows.groupBy(t => (t._3, t._2)).toSeq
      .flatMap { case ((b, s), ts) =>
        ts.map(_._1).sorted.zipWithIndex.map { case (id, p) =>
          (b, p + 1, s, id) } }
      .sortBy { case (b, p, s, _) => (b, p, s) }
      .zipWithIndex.map { case ((b, _, _, id), o) => o.toLong -> ((id, b)) }
      .toMap
    assert(got === want)
    // all of stage 1 precedes all of stage 2
    assert(got.filter(_._2._2 == 1L).keys.max <
      got.filter(_._2._2 == 2L).keys.min)
    // guards: cells cap + null source
    intercept[IllegalArgumentException](
      Scale.curriculumOrder(df, "bin", "src", "id", maxCells = 3))
    intercept[IllegalArgumentException](
      Scale.curriculumOrder(
        Seq((1L, null.asInstanceOf[String], 1L)).toDF("id", "src", "bin"),
        "bin", "src", "id"))
  }

  test("cappedBudgetPlan: hand-computed waterfill, saturation, invariants") {
    import spark.implicits._
    // avail: a=100 tokens, b=1000, c=1000; weights 1:1:2; budget 1000;
    // maxEpochs 1 → caps 100/1000/1000.
    // round 1: W=4 → give 250/250/500; a clips at 100, returns 150
    // round 2: unsat {b,c}, W=3 → give 50/100 → b=300, c=600
    // round 3: rem 0 → fixpoint. Σalloc = 1000, none else saturated
    val avail = Seq(("a", 100L), ("b", 1000L), ("c", 1000L), ("d", 5L))
      .toDF("source", "n_tokens")
    val weights = Seq(("a", 1L), ("b", 1L), ("c", 2L), ("x", 9L))
      .toDF("source", "w_parts") // d unweighted → excluded; x no corpus
    val got = Scale.cappedBudgetPlan(avail, weights, budgetTokens = 1000L,
        maxEpochs = 1, rounds = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet === Set("a", "b", "c"))
    assert(got("a") === ((100L, 100L, true)))
    assert(got("b") === ((1000L, 300L, false)))
    assert(got("c") === ((1000L, 600L, false)))
    // infeasible budget: everything saturates, leftover = budget − Σcap
    val tight = Scale.cappedBudgetPlan(avail, weights, budgetTokens = 99999L,
        maxEpochs = 1, rounds = 8)
      .collect().map(r => (r.getLong(4), r.getBoolean(5)))
    assert(tight.forall(_._2) && tight.map(_._1).sum === 2100L)
    // reference-loop property on a randomized mix: invariants hold and
    // rounds ≥ #sources reaches the fixpoint (one more round is a no-op)
    val rnd = new scala.util.Random(7)
    val srcs = (0 until 12).map(i =>
      (s"s$i", (rnd.nextInt(5000) + 1).toLong, (rnd.nextInt(9) + 1).toLong))
    val av2 = srcs.map(t => (t._1, t._2)).toDF("source", "n_tokens")
    val w2 = srcs.map(t => (t._1, t._3)).toDF("source", "w_parts")
    def run(rounds: Int): Map[String, Long] =
      Scale.cappedBudgetPlan(av2, w2, budgetTokens = 20000L,
          maxEpochs = 3, rounds = rounds)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val a12 = run(12)
    val a13 = run(13)
    assert(a12 === a13, "rounds ≥ #sources must be the fixpoint")
    val caps = srcs.map(t => t._1 -> t._2 * 3).toMap
    assert(a12.forall { case (s, v) => v >= 0 && v <= caps(s) })
    assert(a12.values.sum <= 20000L)
  }

  test("ffdPack ≡ reference FFD; capacity respected; truncation loud") {
    import spark.implicits._
    // lengths chosen so first-fit differs from next-fit: after 10 and
    // 7 open bins [10][7], the 5 must land in bin 2 (7+5=12), the 4 in
    // a new bin — next-fit would have closed bin 1 forever
    val docs = Seq(
      (1L, 9L), (2L, 6L), (3L, 4L), (4L, 3L), (5L, 1L),
      (6L, 25L) // oversize: 25+1 > 12 → singleton truncated window
    ).toDF("doc_id", "toks")
    val got = Scale.ffdPack(docs, "doc_id", col("toks"), capacity = 12,
        eosTokens = 1, blockDocs = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(5)))).toMap
    // charged costs desc: 12*(trunc), 10, 7, 5, 4, 2 — FFD at cap 12:
    // [12] [10,2] [7,5] [4] — ranks: 12→bin1, 10→bin2, 7→bin3,
    // 5→bin3(7+5=12), 4→bin4, 2→bin2(10+2=12)
    assert(got(6L) === ((12L, true, 1L)))
    assert(got(1L) === ((10L, false, 2L)))
    assert(got(2L) === ((7L, false, 3L)))
    assert(got(3L) === ((5L, false, 3L)))
    assert(got(4L) === ((4L, false, 4L)))
    assert(got(5L) === ((2L, false, 2L)))
    // reference FFD on random lengths across MULTIPLE blocks: block
    // boundaries at rank multiples of blockDocs, exact FFD within
    val rnd = (1 to 200).map(i => (i.toLong, ((i * 37) % 50 + 1).toLong))
    val big = Scale.ffdPack(rnd.toDF("doc_id", "toks"), "doc_id",
        col("toks"), capacity = 64, eosTokens = 1, blockDocs = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // reference: sort by (cost desc, id), cut into rank-blocks of 64,
    // FFD per block
    val sorted = rnd.map { case (id, t) => (id, t + 1) }
      .sortBy { case (id, n) => (-n, id) }
    val want = sorted.zipWithIndex.groupBy(_._2 / 64).flatMap {
      case (blk, ds) =>
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.sortBy(_._2).map { case ((id, n), _) =>
          val pos = bins.indexWhere(_ + n <= 64)
          val b = if (pos < 0) { bins += n; bins.length } else {
            bins(pos) += n; pos + 1 }
          id -> ((n, blk.toLong, b.toLong))
        }
    }.toMap
    assert(big.length === 200)
    big.foreach { case (id, n, blk, bin, wid) =>
      assert(want(id) === ((n, blk, bin)), s"doc $id")
      assert(wid === blk * 64 + bin)
    }
    // every window's fill respects capacity
    val fills = big.groupBy(_._5).map { case (_, ds) => ds.map(_._2).sum }
    assert(fills.forall(_ <= 64))
    // guards
    intercept[IllegalArgumentException](
      Scale.ffdPack(docs, "doc_id", col("toks"), capacity = 1, eosTokens = 1))
    intercept[IllegalArgumentException](
      Scale.ffdPack(docs, "doc_id", col("toks"), capacity = 0))
  }

  test("budgetFill: strict inclusive cut, hash order, per-source independence") {
    // source A: three 10-token docs, budget 25 -> exactly the first
    // two in HASH order are kept (30 > 25 cuts the third); source B's
    // single doc fits alone
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L),
      (4L, "B", 20L)).toDF("id", "src", "toks")
    val out = Scale.budgetFill(docs, "src", "id", col("toks"), 25L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val a = out.filter(_._2 == "A").sortBy(_._3)
    assert(a.map(_._5).toSeq === Seq(true, true, false),
      s"strict cut violated: ${a.mkString(", ")}")
    assert(a.map(_._4).toSeq === Seq(10L, 20L, 30L)) // inclusive cumsum
    // hash order, not id order: ranks are a permutation determined by
    // sha52, identical across reruns
    val rerun = Scale.budgetFill(docs, "src", "id", col("toks"), 25L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(rerun.toSet === out.map(t => (t._1, t._3)).toSet)
    assert(out.filter(_._2 == "B").map(_._5).toSeq === Seq(true))
    // zero budget keeps nothing but still ranks
    val zero = Scale.budgetFill(docs, "src", "id", col("toks"), 0L)
      .collect().map(_.getBoolean(5))
    assert(zero.forall(!_))
  }

  test("budgetFill: bucketed two-level prefix ≡ the single-window form") {
    // randomized-ish frame (deterministic LCG): 3 sources with one
    // DOMINANT source holding ~90% of docs — the 100 TB shape the
    // bucketing exists for — plus null tokens and a null source
    val rows = (1L to 400L).map { i =>
      val src = if (i % 10 == 0) { if (i % 20 == 0) "b" else "c" } else "a"
      val toks: java.lang.Long =
        if (i % 37 == 0) null else java.lang.Long.valueOf((i * 2654435761L) % 50 + 1)
      (i, src, toks)
    } :+ ((401L, null.asInstanceOf[String], java.lang.Long.valueOf(7L)))
    val df = rows.toDF("id", "src", "toks")
    def run(buckets: Int) =
      Scale.budgetFill(df, "src", "id", col("toks"), 500L, buckets)
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
          r.getBoolean(5)))
        .sortBy(_._1)
    // buckets=1 IS the single per-source window; 8 exercises the
    // carry-in prefix across non-trivial bucket boundaries
    val single = run(1)
    val bucketed = run(8)
    assert(bucketed.toSeq === single.toSeq)
    assert(single.length === 401)
    // ranks within each source are a contiguous 1..n permutation
    single.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1L to g.length))
    }
  }

  test("budgetFillPlan: per-source budgets; absent source keeps nothing") {
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L),
      (4L, "B", 20L), (5L, "C", 5L)).toDF("id", "src", "toks")
    val budgets = Seq(("A", 25L), ("B", 20L)).toDF("src", "budget_tokens")
    val out = Scale.budgetFillPlan(docs, "src", "id", col("toks"), budgets)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getBoolean(5)))
    // A: 2 of 3 docs fit the 25-token budget; B: exact fit; C: no
    // budget row -> ranked but kept=false
    assert(out.filter(_._2 == "A").count(_._4) === 2)
    assert(out.filter(_._2 == "B").map(_._4).toSeq === Seq(true))
    assert(out.filter(_._2 == "C").map(_._4).toSeq === Seq(false))
    assert(out.filter(_._2 == "C").map(_._3).toSeq === Seq(1L)) // still ranked
    // flat-budget equivalence: budgetFillPlan with a constant budget
    // table == budgetFill with that constant
    val flatB = Seq(("A", 25L), ("B", 25L), ("C", 25L))
      .toDF("src", "budget_tokens")
    val a = Scale.budgetFillPlan(docs, "src", "id", col("toks"), flatB)
      .collect().map(r => (r.getLong(0), r.getBoolean(5))).sortBy(_._1)
    val b = Scale.budgetFill(docs, "src", "id", col("toks"), 25L)
      .collect().map(r => (r.getLong(0), r.getBoolean(5))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("epochManifest: windows partition the docs; deterministic across partitionings") {
    val docs = (1L to 300L)
      .map(i => (i, ((i * 2654435761L) % 40 + 1).toString))
      .map { case (i, n) => (i, ("w " * n.toInt).trim) }
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Scale.epochManifest(docs.repartition(parts), "doc_id",
          size(split(col("text"), " ")).cast("long"),
          capacity = 64, epochs = Seq(1, 2), eosTokens = 1, blockDocs = 32)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4), r.getLong(5)))
        .sortBy(_._1)
    val one = run(1)
    assert(run(7).toSeq === one.toSeq, "manifest depends on partitioning")
    // every doc appears in exactly one window's list
    val all = one.flatMap(_._4.split(",")).map(_.toLong)
    assert(all.sorted.toSeq === (1L to 300L))
    assert(one.map(_._2).sum === 300L)
    // fills respect capacity and equal the doc-list token sums + eos
    assert(one.forall(_._3 <= 64L))
    // both epoch orders are permutations of the windows and differ
    assert(one.map(_._5).sorted.toSeq === (1L to one.length))
    assert(one.map(_._6).sorted.toSeq === (1L to one.length))
    assert(one.count(w => w._5 == w._6) < one.length / 2)
    // non-integral id column fails LOUDLY (a string id would render
    // NULL entries into doc_list via cast)
    val strIds = Seq(("doc-a", 3L), ("doc-b", 4L)).toDF("doc_id", "toks")
    val e = intercept[IllegalArgumentException](
      Scale.epochManifest(strIds, "doc_id", col("toks"),
        capacity = 8, epochs = Seq(1)))
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("matchMixture fails loudly on uncovered sources and w <= 0") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("id", "src")
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString("|")
    // missing source b
    val missing = Scale.matchMixture(docs, "src",
      Seq(("a", 1L)).toDF("src", "w"))
    val e1 = intercept[Exception](missing.collect())
    assert(chain(e1).contains("no positive weight"), chain(e1))
    // zero weight
    val zero = Scale.matchMixture(docs, "src",
      Seq(("a", 1L), ("b", 0L)).toDF("src", "w"))
    val e2 = intercept[Exception](zero.collect())
    assert(chain(e2).contains("no positive weight"), chain(e2))
  }

  test("matchMixture: exact integer plan matches the rational optimum") {
    // weights 1:2:5 over counts 100:50:75 — ratios n/w are
    // a:100, b:25, c:15, so c binds at 15 and
    // kept = floor(w_s * 15) = (15, 30, 75)
    val docs = (1L to 100L).map(i => (i, "a")) ++
      (101L to 150L).map(i => (i, "b")) ++
      (151L to 225L).map(i => (i, "c"))
    val weights = Seq(("a", 1L), ("b", 2L), ("c", 5L)).toDF("src", "w")
    val out = Scale.matchMixture(docs.toDF("id", "src"), "src", weights)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((100L, 1L, 15L, 150000L)))
    assert(out("b") === ((50L, 2L, 30L, 600000L)))
    assert(out("c") === ((75L, 5L, 75L, 1000000L)))
    // the kept mix is EXACTLY proportional to the weights
    assert(out("b")._3 === 2 * out("a")._3)
    assert(out("c")._3 === 5 * out("a")._3)
  }

  test("epochShuffle: each epoch is a permutation, epochs decorrelate") {
    val docs = (1L to 200L).toDF("id")
    val out = Scale.epochShuffle(docs, "id", Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sorted.toSeq === (1L to 200L))
    assert(out.map(_._3).sorted.toSeq === (1L to 200L))
    // not the identity, not id order, and the two epochs differ
    assert(out.count { case (id, o1, _) => id == o1 } < 20)
    assert(out.count { case (_, o1, o2) => o1 == o2 } < 20)
    // reproducible
    val rerun = Scale.epochShuffle(docs, "id", Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rerun.toSet === out.toSet)
  }
}
