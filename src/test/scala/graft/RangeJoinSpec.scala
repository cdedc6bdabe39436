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
}
