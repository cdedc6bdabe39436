package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, TextAnalysis}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries guarantees: heavy terms present, estimates in the hard band") {
    // 2000 noise tokens (all distinct) + two planted heavy terms
    val noise = (1 to 2000).map(i => s"n$i")
    val tokens = noise ++ Seq.fill(600)("heavy1") ++ Seq.fill(400)("heavy2")
    val n = tokens.size.toLong // 3000
    val k = 20 // threshold N/(k+1) ≈ 143 — both planted terms exceed it
    // shuffle deterministically so heavy tokens interleave with noise
    val docs = new scala.util.Random(7).shuffle(tokens)
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")

    val out = HeavyHitters.heavyTerms(docs.repartition(8), "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(out.size <= k, s"summary exceeded k: ${out.size}")
    // guaranteed presence: true count > N/(k+1)
    assert(out.contains("heavy1") && out.contains("heavy2"))
    // hard bounds: c - N/(k+1) <= estimate <= c
    val bound = n / (k + 1)
    assert(out("heavy1") <= 600 && out("heavy1") >= 600 - bound,
      s"heavy1 estimate ${out("heavy1")} outside [${600 - bound}, 600]")
    assert(out("heavy2") <= 400 && out("heavy2") >= 400 - bound,
      s"heavy2 estimate ${out("heavy2")} outside [${400 - bound}, 400]")
    // any surviving noise term truly has count 1 ≤ N/(k+1): its
    // estimate must not exceed its true count
    out.keys.filterNot(_.startsWith("heavy")).foreach { t =>
      assert(out(t) <= 1L, s"noise term $t overestimated: ${out(t)}")
    }
  }

  test("streaming Misra-Gries keeps the heavy-hitter guarantees live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    // the bounded-state aggregator runs unchanged as a streaming typed
    // agg — ≤ k counters of state, the "trending terms right now" op
    val q = input.toDS()
      .select(HeavyHitters.misraGries(4).toColumn.name("mg"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // 60 a, 30 b, 6 c (interleaved across batches), 4 singletons
      input.addData(Seq.fill(25)("a") ++ Seq.fill(20)("b") ++ Seq("c", "x1"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(35)("a") ++ Seq.fill(10)("b") ++
        Seq.fill(5)("c") ++ Seq("x2", "x3", "x4"): _*)
      q.processAllAvailable()
      val mg = spark.table("mg_stream")
        .select(explode(col("mg")).as(Seq("term", "w")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Map("a" -> 60L, "b" -> 30L, "c" -> 6L,
        "x1" -> 1L, "x2" -> 1L, "x3" -> 1L, "x4" -> 1L)
      val n = exact.values.sum
      assert(mg.size <= 4)
      // anything with true count > n/(k+1) = 100/5 must survive
      exact.filter(_._2 > n / 5).keys.foreach(t =>
        assert(mg.contains(t), s"heavy term $t evicted"))
      // every surviving weight is a lower bound within n/(k+1) of truth
      mg.foreach { case (t, w) =>
        assert(w <= exact(t) && exact(t) - w <= n / 5)
      }
    } finally q.stop()
  }

  test("exactHeavyHitters ≡ brute-force frequent items, any partitioning") {
    // zipf-ish synthetic stream: term t_i appears ~ 3000/i times, so
    // the frequent-items cut lands mid-distribution for several k
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(3000 / i)(s"t$i")))
    val df = stream.toDF("term")
    val exact = stream.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = stream.size.toLong
    for (k <- Seq(3, 8, 17); parts <- Seq(1, 5, 13)) {
      val expected = exact.filter { case (_, c) => c * (k + 1) > n }
      val got = HeavyHitters
        .exactHeavyHitters(df.repartition(parts), "term", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"[k=$k parts=$parts] got ${got.keySet} want ${expected.keySet}")
      // and the reported total is the full stream, not the candidates
      val totals = HeavyHitters
        .exactHeavyHitters(df.repartition(parts), "term", k)
        .select("n_total").distinct().collect().map(_.getLong(0))
      if (expected.nonEmpty) assert(totals.sameElements(Array(n)))
    }
  }

  test("exactHeavyHitters: nulls excluded, empty answer is empty frame") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), Some("c"),
      Some("d"), Some("e")).toDF("term")
    // n=6 non-null; k=1 → threshold 3: only a term with count ≥ 4
    // qualifies; a has 2 → empty
    assert(HeavyHitters.exactHeavyHitters(df, "term", 1).count() === 0L)
    // k=2 → cnt*3 > 6 → still none (a: 6 = not >)
    assert(HeavyHitters.exactHeavyHitters(df, "term", 2).count() === 0L)
    val big = df.union(Seq.fill(5)(Some("a")).toDF("term"))
    // n=11, a=7: k=1 → 14 > 11 → {a}
    val out = HeavyHitters.exactHeavyHitters(big, "term", 1).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
    assert(out.head.getLong(1) === 7L && out.head.getLong(2) === 11L)
  }

  test("summary is partitioning-invariant in its guarantees (mergeable)") {
    val docs = Tables.documents(spark, sf)
    val k = 10
    val exact = TextAnalysis.termCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 7)) {
      val mg = HeavyHitters.heavyTerms(docs.repartition(parts), "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mg.size <= k)
      mg.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c, s"[$parts parts] $t overestimated: $est > $c")
        assert(est >= c - n / (k + 1),
          s"[$parts parts] $t below band: $est < ${c - n / (k + 1)}")
      }
      // every term heavier than N/(k+1) must be present
      exact.filter(_._2 > n / (k + 1)).keys.foreach(t =>
        assert(mg.contains(t), s"[$parts parts] heavy term $t missing"))
    }
  }
}
