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
}
