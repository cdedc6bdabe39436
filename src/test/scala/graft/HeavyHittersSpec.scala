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
