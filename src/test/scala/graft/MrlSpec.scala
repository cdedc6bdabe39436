package graft

import org.apache.spark.sql.functions._

import graft.functions.Mrl

class MrlSpec extends SparkSpec {
  import spark.implicits._

  private val qGrid = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  /** True rank band of value v in sorted data: [#(< v) + 1, #(≤ v)]. */
  private def rankBand(sorted: IndexedSeq[Double], v: Double): (Long, Long) =
    ((sorted.count(_ < v) + 1).toLong, sorted.count(_ <= v).toLong)

  /** Deterministic pseudo-random doubles (no Random: reproducible). */
  private def knuth(n: Int): IndexedSeq[Double] =
    (1 to n).map(i => ((i.toLong * 2654435761L) % 1000003L).toDouble)

  test("exact below capacity: quantiles equal order statistics, any partitioning") {
    val data = knuth(50)
    val sorted = data.sorted
    for (parts <- Seq(1, 3, 7); order <- Seq(data, data.reverse)) {
      val df = order.toDF("v").repartition(parts)
        .withColumn("g", lit(1L))
      val out = Mrl.groupQuantiles(df, "g", "v", k = 64, qGrid)
        .collect().head
      assert(out.getAs[Long]("n") === 50L)
      assert(out.getAs[Long]("err_bound") === 1L) // err 0 + maxWeight 1
      val got = out.getAs[scala.collection.Seq[Double]]("values").toSeq
      val want = qGrid.map(q =>
        sorted((math.ceil(q * 50).toInt max 1) - 1))
      assert(got === want, s"parts=$parts")
    }
  }

  test("collapse regime: certified bound holds, including sorted input (worst case)") {
    val n = 20000
    val rand = knuth(n)
    for ((data, label) <- Seq((rand, "hashed"), (rand.sorted, "sorted"),
        (rand.sorted.reverse, "reverse-sorted")); parts <- Seq(1, 8)) {
      val sorted = data.sorted
      val out = Mrl.groupQuantiles(
          data.toDF("v").repartition(parts).withColumn("g", lit(1L)),
          "g", "v", k = 128, qGrid)
        .collect().head
      val bound = out.getAs[Long]("err_bound")
      // the bound must be real (collapses happened) and useful (≪ n)
      assert(bound > 1L && bound < n / 8,
        s"$label/$parts: bound $bound out of sane range")
      val got = out.getAs[scala.collection.Seq[Double]]("values").toSeq
      qGrid.zip(got).foreach { case (q, v) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        val (lo, hi) = rankBand(sorted, v)
        val dist =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0L
        assert(dist <= bound,
          s"$label/$parts q=$q: rank dist $dist exceeds certified $bound")
      }
    }
  }

  test("bounded state: ladder holds O(k log(n/k)) values, not the stream") {
    val n = 100000
    val agg = Mrl.quantilesAgg(k = 64, Seq(0.5))
    var b = agg.zero
    knuth(n).foreach(v => b = agg.reduce(b, v))
    val stored = b.acc.size + b.slots.map(_.size).sum
    // log2(100000/64) ≈ 10.6 ⇒ ≤ ~12 buffers of 64
    assert(stored <= 64 * 13, s"state holds $stored values")
    assert(b.n === n.toLong)
  }

  test("merge is a valid sketch combine: bound covers the merged answer") {
    val a = knuth(5000)
    val b = knuth(5000).map(_ + 0.5) // interleaves, not disjoint ranges
    val agg = Mrl.quantilesAgg(k = 64, Seq(0.25, 0.5, 0.75))
    def build(xs: Seq[Double]) = xs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(build(a), build(b))
    val res = agg.finish(merged)
    assert(res.n === 10000L)
    val sorted = (a ++ b).sorted.toIndexedSeq
    Seq(0.25, 0.5, 0.75).zip(res.values).foreach { case (q, v) =>
      val target = math.ceil(q * 10000).toLong
      val (lo, hi) = rankBand(sorted, v)
      val dist = if (target < lo) lo - target
        else if (target > hi) target - hi else 0L
      assert(dist <= res.err_bound, s"q=$q dist $dist > ${res.err_bound}")
    }
  }

  test("empty group and null handling") {
    val df = Seq((1L, Some(3.0)), (1L, None), (2L, Some(7.0)))
      .toDF("g", "v")
    val out = Mrl.groupQuantiles(df, "g", "v", k = 4, Seq(0.5, 1.0))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("values").toSeq).toMap
    assert(out(1L) === Seq(3.0, 3.0)) // null dropped, single value
    assert(out(2L) === Seq(7.0, 7.0))
  }
}
