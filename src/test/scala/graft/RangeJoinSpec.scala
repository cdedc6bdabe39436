package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("finds exactly the pairs within tolerance, each once, a<b") {
    val pts = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:30")),  // 30s from 1
      (3L, ts("2024-01-01 10:01:10")),  // 40s from 2, 70s from 1
      (4L, ts("2024-01-01 12:00:00"))   // far from all
    ).toDF("event_id", "ts")
    val pairs = RangeJoin.selfPairsWithin(pts, "event_id", "ts", 60L * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map((1L, 2L) -> 30000000L, (2L, 3L) -> 40000000L))
  }

  test("bucket-boundary pairs are found (cross-bucket neighbors)") {
    // 59.9s apart but straddling a 60s bucket boundary
    val pts = Seq(
      (1L, ts("2024-01-01 10:00:59")),
      (2L, ts("2024-01-01 10:01:58"))
    ).toDF("event_id", "ts")
    val pairs = RangeJoin.selfPairsWithin(pts, "event_id", "ts", 60L * 1000000)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(2) === 59000000L)
  }

  test("matches a brute-force check on the fixture") {
    val ev = Tables.events(spark, sf).select("event_id", "ts").limit(2000)
    val tol = 60L * 1000000
    val fast = RangeJoin.selfPairsWithin(ev, "event_id", "ts", tol)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.select(col("event_id").as("id_a"), unix_micros(col("ts")).as("ua"))
    val b = ev.select(col("event_id").as("id_b"), unix_micros(col("ts")).as("ub"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") && abs(col("ua") - col("ub")) <= tol)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === brute)
    assert(brute.nonEmpty)
  }

  test("overlappingIntervals: touching, nested, disjoint, multi-bucket once") {
    val hour = 3600L * 1000000
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")), // nested in 1
      (3L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // touches 1
      (4L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:30:00")), // disjoint
      // spans 5 buckets and overlaps 1, 2, 3 — each pair exactly once
      (5L, ts("2024-01-01 09:30:00"), ts("2024-01-01 14:00:00"))
    ).toDF("id", "s", "e")
    val out = RangeJoin.overlappingIntervals(iv, "id", "s", "e", hour)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (1L, 5L), (2L, 5L),
      (3L, 5L), (4L, 5L)))
    assert(out((1L, 3L)) === 0L)               // touching endpoints overlap 0
    assert(out((1L, 2L)) === 10L * 60 * 1000000) // nested: inner length
    assert(out((1L, 5L)) === 3600L * 1000000)  // full hour shared
  }

  test("overlappingIntervals ≡ quadratic reference on random intervals") {
    val rnd = new scala.util.Random(17)
    val base = ts("2024-01-01 00:00:00").getTime
    val iv = (1L to 300L).map { i =>
      val s = base + rnd.nextInt(3 * 24 * 3600) * 1000L
      (i, new Timestamp(s), new Timestamp(s + rnd.nextInt(5 * 3600) * 1000L))
    }.toDF("id", "s", "e")
    val fast = RangeJoin.overlappingIntervals(iv, "id", "s", "e", 3600L * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = iv.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
      r.getTimestamp(2).getTime))
    val brute = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1, (math.min(a._3, b._3) - math.max(a._2, b._2)) * 1000L))
      .toSet
    assert(fast === brute)
    assert(brute.size > 100)
  }
}
