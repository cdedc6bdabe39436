package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{EcommerceStreamJob, Windows}

/** Watermarked-window variants: bounded-state streaming aggregation and
  * dedup (the scale path beyond the reference's unwindowed state). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def jsonTx(id: String, cat: String, amt: Double, ts: String): String =
    s"""{"transactionId":"$id","productId":"p1","productName":"laptop",
       |"productCategory":"$cat","productPrice":$amt,"productQuantity":1,
       |"productBrand":"apple","totalAmount":$amt,"currency":"USD",
       |"customerId":"c1","transactionDate":"$ts",
       |"paymentMethod":"credit_card"}""".stripMargin.replaceAll("\n", "")

  test("tumbling window aggregates per (day, category) with bounded state") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF())
    val agg = Windows.salesPerCategoryWindowed(tx, "transactionDate",
      "productCategory", "totalAmount", windowLength = "1 day",
      watermark = "1 hour")

    val q = agg.writeStream.format("memory").queryName("win_cat")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
        jsonTx("t2", "electronic", 5.0, "2024-11-08T23:00:00.000000"),
        jsonTx("t3", "electronic", 7.0, "2024-11-09T01:00:00.000000"))
      q.processAllAvailable()
      val out = spark.table("win_cat")
        .groupBy($"window_start", $"category")
        .agg(org.apache.spark.sql.functions.max($"total_sales").as("total_sales"))
        .collect()
        .map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(2))).toMap
      assert(out === Map("2024-11-08" -> 15.0, "2024-11-09" -> 7.0))
    } finally q.stop()
  }

  test("sliding windows produce overlapping buckets") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF())
    val agg = Windows.slidingRevenue(tx, "transactionDate", "totalAmount",
      windowLength = "1 hour", slide = "30 minutes", watermark = "1 hour")

    val q = agg.writeStream.format("memory").queryName("win_slide")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(jsonTx("t1", "electronic", 10.0, "2024-11-08T10:15:00.000000"))
      q.processAllAvailable()
      // one event at 10:15 falls into [09:30,10:30) and [10:00,11:00)
      val windows = spark.table("win_slide")
        .select($"window_start").collect().map(_.getTimestamp(0).toString).sorted
      assert(windows.length === 2)
      assert(windows(0).contains("09:30:00"))
      assert(windows(1).contains("10:00:00"))
    } finally q.stop()
  }

  test("session windows split on inactivity gaps per key") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF())
    val agg = Windows.sessionRevenue(tx, "transactionDate", "customerId",
      "totalAmount", gap = "10 minutes", watermark = "1 hour")

    // session windows emit on close -> append mode + a watermark pusher
    val q = agg.writeStream.format("memory").queryName("win_session")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
        jsonTx("t2", "electronic", 5.0, "2024-11-08T10:05:00.000000"), // same session
        jsonTx("t3", "electronic", 7.0, "2024-11-08T11:00:00.000000")) // new session
      q.processAllAvailable()
      // advance the watermark past both session ends so they close
      input.addData(jsonTx("t4", "electronic", 1.0, "2024-11-08T13:00:00.000000"))
      q.processAllAvailable()
      val sessions = spark.table("win_session")
        .collect().map(r => r.getTimestamp(0).toString.substring(11, 16) ->
          r.getAs[Double]("total_sales")).toMap
      assert(sessions === Map("10:00" -> 15.0, "11:00" -> 7.0))
    } finally q.stop()
  }

  test("windowedDistinctRegisters: append-mode HLL registers ≡ batch per window, late data dropped") {
    import java.sql.Timestamp
    import graft.functions.Hll
    implicit val sql = spark.sqlContext
    val p = 4
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String, Long)]
    val regs = Windows.windowedDistinctRegisters(
      input.toDF().toDF("ts", "etype", "user"), "ts", "etype", "user",
      p = p, windowLength = "1 hour", watermark = "30 minutes")
    val q = regs.writeStream.format("memory").queryName("win_hll")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 1 [10:00, 11:00): 40 users across two types, duplicates
      // included (distinct evidence, not row counts)
      val w1 = (1L to 40L).map(u =>
        (ts(s"2024-11-08 10:${10 + (u % 40).toInt / 60}:${10 + (u % 50).toInt}"),
          if (u % 3 == 0) "click" else "view", u)) ++
        (1L to 10L).map(u => (ts("2024-11-08 10:30:00"), "view", u))
      input.addData(w1: _*)
      q.processAllAvailable()
      // nothing emitted: watermark hasn't passed window 1's end
      assert(spark.table("win_hll").count() === 0L)
      // an 12:00 event pushes the watermark to 11:30 → window 1 closes
      input.addData((ts("2024-11-08 12:00:00"), "view", 999L))
      q.processAllAvailable()
      val emitted = spark.table("win_hll")
        .select($"etype", $"bucket", $"rho")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSet
      val batch = Hll.registers(
          w1.toDF("ts", "etype", "user"), "etype", "user", p)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSet
      assert(emitted == batch,
        s"missing=${batch -- emitted} extra=${emitted -- batch}")
      // a LATE window-1 event (behind the 11:30 watermark) with a new
      // user must NOT re-open the closed window
      input.addData((ts("2024-11-08 10:45:00"), "view", 777L))
      q.processAllAvailable()
      val after = spark.table("win_hll")
        .filter($"window_start" === ts("2024-11-08 10:00:00")).count()
      assert(after === emitted.size.toLong)
    } finally q.stop()
  }

  test("windowedSampleRows: append-mode bottom-k sample ≡ batch per window, state bounded by k") {
    import java.sql.Timestamp
    import graft.functions.HashSample
    implicit val sql = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val sampled = Windows.windowedSampleRows(
      input.toDF().toDF("ts", "etype", "event_id", "value"),
      "ts", "etype", "event_id", "value", k = 16,
      windowLength = "1 hour", watermark = "30 minutes")
    val q = sampled.writeStream.format("memory").queryName("win_sample")
      .outputMode(OutputMode.Append()).start()
    try {
      // 120 rows in window 1 across two keys — far more than k=16
      val w1 = (1L to 120L).map(i =>
        (ts("2024-11-08 10:20:00"), if (i % 2 == 0) "view" else "click",
          i, i * 1.5))
      input.addData(w1: _*)
      q.processAllAvailable()
      input.addData((ts("2024-11-08 12:00:00"), "view", 999L, 1.0))
      q.processAllAvailable()
      val emitted = spark.table("win_sample")
        .filter($"window_start" === ts("2024-11-08 10:00:00"))
        .select($"etype", $"hash", $"value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // bounded: k rows per key, never the 60 rows that passed through
      assert(emitted.size === 32)
      val batch = HashSample.sample(
          w1.toDF("ts", "etype", "event_id", "value"),
          "etype", "event_id", "value", k = 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(emitted == batch,
        s"missing=${batch -- emitted} extra=${emitted -- batch}")
    } finally q.stop()
  }

  test("windowedTrendingTerms: per-window MG guarantees, windows independent") {
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String)]
    val trending = Windows.windowedTrendingTerms(
      input.toDF().toDF("ts", "text"), "ts", "text", k = 4,
      windowLength = "1 hour", watermark = "30 minutes")
    val q = trending.writeStream.format("memory").queryName("win_trend")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 1: 'alpha' heavy (60), 'beta' medium (25), 15 singletons
      // → N=100, k=4: anything > 20 guaranteed present
      val w1Text = (Seq.fill(60)("alpha") ++ Seq.fill(25)("beta") ++
        (1 to 15).map(i => s"noise$i"))
      val w1 = w1Text.grouped(10).map(g =>
        (ts("2024-11-08 10:15:00"), g.mkString(" "))).toSeq
      // window 2: a DIFFERENT heavy term — windows must not bleed
      val w2 = Seq((ts("2024-11-08 11:10:00"),
        Seq.fill(30)("gamma").mkString(" ")))
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      input.addData((ts("2024-11-08 13:00:00"), "tick"))
      q.processAllAvailable()
      val rows = spark.table("win_trend")
        .collect().map(r => (r.getTimestamp(0).toString.substring(11, 13),
          r.getString(2), r.getLong(3)))
      val w1Terms = rows.filter(_._1 == "10").map(t => t._2 -> t._3).toMap
      val w2Terms = rows.filter(_._1 == "11").map(t => t._2 -> t._3).toMap
      // guarantee: count > N/(k+1) = 20 ⇒ present; weights are lower
      // bounds within N/(k+1) of truth
      assert(w1Terms.contains("alpha") && w1Terms.contains("beta"))
      assert(w1Terms.size <= 4)
      assert(w1Terms("alpha") <= 60 && w1Terms("alpha") >= 60 - 20)
      assert(w1Terms("beta") <= 25 && w1Terms("beta") >= 25 - 20)
      // window independence: gamma only in window 2, alpha absent there
      assert(w2Terms.keySet.contains("gamma") && w2Terms("gamma") === 30L)
      assert(!w2Terms.contains("alpha"))
      assert(!w1Terms.contains("gamma"))
    } finally q.stop()
  }

  test("windowedQuantiles: exact in small windows, certified bound in big ones, windows independent") {
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String, Double)]
    val quants = Windows.windowedQuantiles(
      input.toDF().toDF("ts", "etype", "value"),
      "ts", "etype", "value", k = 64, qs = Seq(0.5, 0.9),
      windowLength = "1 hour", watermark = "30 minutes")
    val q = quants.writeStream.format("memory").queryName("win_quant")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 1 'api': 40 values (< k ⇒ exact); window 1 'web': 1000
      // values (collapses engaged ⇒ certified bound); window 2 'api':
      // different data — windows must not bleed
      val w1api = (1 to 40).map(i =>
        (ts("2024-11-08 10:05:00"), "api", i.toDouble))
      val w1web = (1 to 1000).map(i =>
        (ts("2024-11-08 10:25:00"), "web",
          ((i.toLong * 2654435761L) % 997L).toDouble))
      val w2api = (1 to 10).map(i =>
        (ts("2024-11-08 11:10:00"), "api", 1000.0 + i))
      input.addData(w1api ++ w1web ++ w2api: _*)
      q.processAllAvailable()
      input.addData((ts("2024-11-08 13:00:00"), "api", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_quant").collect().map(r =>
        (r.getTimestamp(0).toString.substring(11, 13), r.getString(2)) ->
          ((r.getLong(3), r.getLong(4),
            r.getAs[scala.collection.Seq[Double]]("values").toSeq))).toMap
      // small window exact: p50 of 1..40 = 20, p90 = 36, bound at floor
      val (nA, bA, vA) = rows(("10", "api"))
      assert(nA === 40L && bA === 1L && vA === Seq(20.0, 36.0))
      // big window: bound certified vs the window's true ranks
      val (nW, bW, vW) = rows(("10", "web"))
      assert(nW === 1000L && bW > 1L && bW < 250L)
      val sorted = w1web.map(_._3).sorted
      Seq(0.5, 0.9).zip(vW).foreach { case (qq, v) =>
        val target = math.ceil(qq * 1000).toLong
        val lo = sorted.count(_ < v) + 1
        val hi = sorted.count(_ <= v)
        val dist = if (target < lo) lo - target
          else if (target > hi) target - hi else 0L
        assert(dist <= bW, s"q=$qq rank dist $dist > $bW")
      }
      // window independence
      val (n2, b2, v2) = rows(("11", "api"))
      assert(n2 === 10L && b2 === 1L && v2 === Seq(1005.0, 1009.0))
    } finally q.stop()
  }

  test("windowedCheckRatios: per-window verdicts, violation burst localized, append once") {
    import java.sql.Timestamp
    import graft.operators.DataQuality.{Completeness, InRange, Uniqueness}
    implicit val sql = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, Option[Double])]
    val checks = Seq(Completeness("complete_v", "v"),
      InRange("range_v", "v", 0, 100, minRatio = 0.9))
    val q = Windows.windowedCheckRatios(
        input.toDF().toDF("ts", "v"), "ts", checks,
        windowLength = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_dq")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 10:00 healthy (10 rows, all present and in range);
      // window 11:00 has a burst: 2 nulls + 1 out-of-range in 10 rows
      val w1 = (1 to 10).map(i => (ts("2024-11-08 10:05:00"), Some(i * 1.0)))
      val w2 = (1 to 7).map(i => (ts("2024-11-08 11:05:00"), Some(i * 1.0))) ++
        Seq((ts("2024-11-08 11:06:00"), None),
          (ts("2024-11-08 11:07:00"), None),
          (ts("2024-11-08 11:08:00"), Some(500.0)))
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      input.addData((ts("2024-11-08 13:00:00"), Some(1.0)))
      q.processAllAvailable()
      val rows = spark.table("win_dq").collect().map(r =>
        (r.getTimestamp(0).toString.substring(11, 13), r.getString(2)) ->
          ((r.getDouble(3), r.getBoolean(4)))).toMap
      assert(rows(("10", "complete_v")) === ((1.0, true)))
      assert(rows(("10", "range_v")) === ((1.0, true)))
      assert(rows(("11", "complete_v")) === ((0.8, false)))
      // 7 of 10 in range = 0.7 < 0.9 (nulls fail range too)
      assert(rows(("11", "range_v")) === ((0.7, false)))
    } finally q.stop()
    // non-row-local checks are rejected loudly
    intercept[IllegalArgumentException] {
      Windows.windowedCheckRatios(
        spark.readStream.format("rate").load(), "timestamp",
        Seq(Uniqueness("u", Seq("value"))))
    }
  }

  test("dedupWithinWatermark drops duplicate ids inside the horizon") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF())
    val deduped = Windows.dedupWithinWatermark(tx, Seq("transactionId"),
      "transactionDate", watermark = "1 hour")

    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        jsonTx("a", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
        jsonTx("a", "electronic", 10.0, "2024-11-08T10:00:05.000000"), // replay
        jsonTx("b", "fashion", 4.0, "2024-11-08T10:01:00.000000"))
      q.processAllAvailable()
      input.addData( // replay in a later batch, still inside the horizon
        jsonTx("a", "electronic", 10.0, "2024-11-08T10:02:00.000000"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select($"transactionId").collect().map(_.getString(0)).sorted
      assert(ids === Array("a", "b"))
    } finally q.stop()
  }
}
