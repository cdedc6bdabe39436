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
