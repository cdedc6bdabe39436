package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 11:00:00"), 110.0),
    ("A", ts("2024-01-01 12:00:00"), 120.0),
    ("B", ts("2024-01-01 10:30:00"), 55.0)
  ).toDF("sym", "qts", "price")

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:30:00")), // between quotes -> 100
    (2L, "A", ts("2024-01-01 11:00:00")), // exactly at quote -> 110 (<=)
    (3L, "A", ts("2024-01-01 09:00:00")), // before any quote -> null
    (4L, "B", ts("2024-01-01 23:00:00")), // long after -> 55
    (5L, "C", ts("2024-01-01 10:00:00"))  // key with no quotes -> null
  ).toDF("trade_id", "sym", "tts")

  test("asofJoin attaches the latest right value at-or-before each left ts") {
    val out = AsOf.asofJoin(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(100.0),
      2L -> Some(110.0),
      3L -> None,
      4L -> Some(55.0),
      5L -> None))
  }

  test("left row count is preserved (no many-to-many blowup)") {
    val out = AsOf.asofJoin(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
    assert(out.count() === trades.count())
  }

  test("multiple right value columns carry together") {
    val q2 = quotes.withColumn("src", concat(lit("q-"), col("price").cast("int")))
    val out = AsOf.asofJoin(trades, "sym", "tts", q2, "sym", "qts",
        Seq("price", "src"))
      .filter(col("trade_id") === 1).collect().head
    assert(out.getDouble(3) === 100.0)
    assert(out.getString(4) === "q-100")
  }

  test("matched right row is attached as a UNIT: its null fields stay null") {
    // latest row has src=NULL; a per-column fill would backfill src from
    // the older row — the matched row must come through whole
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), 5.0, Some("old")),
      ("A", ts("2024-01-01 11:00:00"), 9.0, Option.empty[String])
    ).toDF("sym", "qts", "price", "src")
    val out = AsOf.asofJoin(
        Seq((1L, "A", ts("2024-01-01 12:00:00"))).toDF("trade_id", "sym", "tts"),
        "sym", "tts", q, "sym", "qts", Seq("price", "src"))
      .collect().head
    assert(out.getDouble(3) === 9.0)
    assert(out.isNullAt(4)) // NOT "old"
  }

  test("null right timestamps and keys never match") {
    val q = Seq(
      (Some("A"), Option.empty[Timestamp], 99.0), // null ts: unmatched
      (Option.empty[String], Some(ts("2024-01-01 00:00:00")), 77.0) // null key
    ).toDF("sym", "qts", "price")
    val l = Seq(
      (1L, Some("A"), ts("2024-01-01 12:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 12:00:00"))
    ).toDF("trade_id", "sym", "tts")
    val out = AsOf.asofJoin(l, "sym", "tts", q, "sym", "qts", Seq("price"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(out === Map(1L -> true, 2L -> true))
  }

  test("mismatched timestamp types are rejected (no silent tz-dependent cast)") {
    val dateRight = quotes.withColumn("qts", col("qts").cast("date"))
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, "sym", "tts", dateRight, "sym", "qts", Seq("price"))
    }
  }

  test("asofJoinBucketed matches asofJoin on the timestamp fixture (hourly buckets)") {
    val hourly = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / lit(3600L * 1000000L))
    val out = AsOf.asofJoinBucketed(trades, "sym", "tts",
        quotes, "sym", "qts", Seq("price"), hourly)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(100.0),
      2L -> Some(110.0),
      3L -> None,
      4L -> Some(55.0),
      5L -> None))
  }

  test("property: asofJoinBucketed ≡ asofJoin for any bucket width, incl. a hot key") {
    // one pathological hot key (80% of rows) + a long tail; long timestamps
    val rnd = new scala.util.Random(42)
    def key(): String = if (rnd.nextInt(5) < 4) "HOT" else s"k${rnd.nextInt(20)}"
    val leftRows = Seq.tabulate(800)(i => (i.toLong, key(), rnd.nextInt(10000).toLong))
    val rightRaw = Seq.tabulate(600)(_ => (key(), rnd.nextInt(10000).toLong, rnd.nextDouble()))
    // enforce the operator contract: unique (key, ts) on the right
    val rightRows = rightRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = leftRows.toDF("id", "k", "ts")
    val r = rightRows.toDF("k", "ts", "v")

    val expected = AsOf.asofJoin(l, "k", "ts", r, "k", "ts", Seq("v"))
      .collect().map(x => (x.getLong(0), if (x.isNullAt(3)) null else x.getDouble(3)))
      .sortBy(_._1).toSeq

    // widths spanning one-bucket-per-row through everything-in-one-bucket
    for (width <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val got = AsOf.asofJoinBucketed(l, "k", "ts", r, "k", "ts", Seq("v"),
          c => floor(c / lit(width)))
        .collect().map(x => (x.getLong(0), if (x.isNullAt(3)) null else x.getDouble(3)))
        .sortBy(_._1).toSeq
      assert(got === expected, s"divergence at bucket width $width")
    }
  }

  test("asofJoinBucketed: null left ts / null left key stay unmatched") {
    val r = Seq(("A", 10L, 1.0)).toDF("k", "ts", "v")
    val l = Seq(
      (1L, Some("A"), Some(50L)),
      (2L, Some("A"), Option.empty[Long]),
      (3L, Option.empty[String], Some(50L))
    ).toDF("id", "k", "ts")
    val out = AsOf.asofJoinBucketed(l, "k", "ts", r, "k", "ts", Seq("v"),
        c => floor(c / lit(100L)))
      .collect().map(x => x.getLong(0) -> x.isNullAt(3)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("asofJoinForward attaches the earliest right value at-or-after each left ts") {
    val out = AsOf.asofJoinForward(trades, "sym", "tts",
        quotes, "sym", "qts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(110.0), // next quote after 10:30
      2L -> Some(110.0), // exactly at quote: >= is inclusive
      3L -> Some(100.0), // before any quote: the first one
      4L -> None,        // after the last quote
      5L -> None))       // key with no quotes
  }

  test("asofJoinNearest picks the closer side, ties to backward") {
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 12:00:00"), 2.0)
    ).toDF("sym", "qts", "price")
    val l = Seq(
      (1L, "A", ts("2024-01-01 10:30:00")), // closer to 10:00 → 1.0
      (2L, "A", ts("2024-01-01 11:30:00")), // closer to 12:00 → 2.0
      (3L, "A", ts("2024-01-01 11:00:00")), // EQUIDISTANT → backward 1.0
      (4L, "A", ts("2024-01-01 09:00:00")), // only forward exists → 1.0
      (5L, "A", ts("2024-01-01 13:00:00")), // only backward exists → 2.0
      (6L, "B", ts("2024-01-01 10:00:00"))  // no quotes → null
    ).toDF("trade_id", "sym", "tts")
    val out = AsOf.asofJoinNearest(l, "sym", "tts", q, "sym", "qts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(1.0), 5L -> Some(2.0), 6L -> None))
  }

  test("forward/nearest: a NULL left timestamp stays unmatched (nulls sort first — the frame would hand it the earliest right row)") {
    val q = Seq(("A", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("sym", "qts", "price")
    val l = Seq((1L, "A", Option(ts("2024-01-01 09:00:00"))),
        (2L, "A", Option.empty[Timestamp]))
      .toDF("trade_id", "sym", "tts")
    def nulls(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(nulls(AsOf.asofJoinForward(l, "sym", "tts", q, "sym", "qts",
      Seq("price"))) === Map(1L -> false, 2L -> true))
    assert(nulls(AsOf.asofJoinNearest(l, "sym", "tts", q, "sym", "qts",
      Seq("price"))) === Map(1L -> false, 2L -> true))
  }
}
