package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamJoin

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches clicks within the window only") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.clicksAfterImpressions(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", windowSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:30")))
      // in-window click for ad 1; out-of-window (61 s) click for ad 2;
      // click for an ad never impressed; click BEFORE its impression
      clks.addData(
        (1L, ts("2024-01-01 10:00:45")),
        (2L, ts("2024-01-01 10:01:31")),
        (9L, ts("2024-01-01 10:00:10")),
        (1L, ts("2024-01-01 09:59:59")))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
      assert(rows.toSet === Set((1L, ts("2024-01-01 10:00:45"), 45000000L)))
      // a second impression for ad 2 close to the late click DOES join —
      // the window is per-pair, not per-key
      imps.addData((2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      val rows2 = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
      assert(rows2 === Set(
        (1L, ts("2024-01-01 10:00:45")),
        (2L, ts("2024-01-01 10:01:31"))))
    } finally q.stop()
  }

  test("join state is evicted once watermarks pass the interval bound") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.clicksAfterImpressions(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", windowSeconds = 60, lateness = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("attrib_state")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")))
      clks.addData((1L, ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      // push both watermarks far past imp_ts + window + lateness
      imps.addData((2L, ts("2024-01-01 12:00:00")))
      clks.addData((2L, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      // one more micro-batch so eviction driven by the new watermark runs
      imps.addData((3L, ts("2024-01-01 12:30:00")))
      clks.addData((3L, ts("2024-01-01 12:30:01")))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators(0)
      // the 10:00 pair must be gone from the buffers; only recent rows
      // (≤ 4 = two sides × two recent batches) may remain
      assert(state.numRowsTotal <= 4,
        s"state not evicted: ${state.numRowsTotal} rows buffered")
    } finally q.stop()
  }

  test("left-outer interval join: nulls emit exactly at watermark eviction") {
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.clicksAfterImpressionsOuter(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", windowSeconds = 60,
      lateness = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      // ad 1 gets an in-window click; ad 2 never gets one
      imps.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:30")))
      clks.addData((1L, ts("2024-01-01 10:00:45")))
      q.processAllAvailable()
      def rows() = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(2)) null else r.getTimestamp(2))).toSet
      // before the click watermark passes imp_ts+window+lateness, the
      // unmatched impression must NOT have emitted its null row
      assert(rows() === Set((1L, ts("2024-01-01 10:00:45"))),
        "null row emitted before watermark eviction")
      val buffered = q.lastProgress.stateOperators(0).numRowsTotal
      assert(buffered >= 2, s"impression 2 not held in state: $buffered")
      // advance BOTH watermarks far past the bound → eviction emits the
      // null-padded row for ad 2 exactly once
      imps.addData((7L, ts("2024-01-01 12:00:00")))
      clks.addData((7L, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      imps.addData((8L, ts("2024-01-01 12:30:00")))
      clks.addData((8L, ts("2024-01-01 12:30:01")))
      q.processAllAvailable()
      val got = rows()
      assert(got.contains((2L, null)), s"missing evicted null row: $got")
      assert(got.count(_._1 == 2L) === 1, "null row must emit exactly once")
      // lag_us is null exactly on the unmatched row
      val lagNulls = spark.table("attrib_outer").collect()
        .filter(_.getLong(0) == 2L).map(_.isNullAt(3)).toSeq
      assert(lagNulls === Seq(true))
    } finally q.stop()
  }

  test("left-outer batch form ≡ streaming predicate (nulls immediate)") {
    val imps = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:30"))).toDF("ad_id", "imp_ts")
    val clks = Seq((1L, ts("2024-01-01 10:00:45")),
      (2L, ts("2024-01-01 10:01:31"))).toDF("ad_id", "click_ts")
    val out = StreamJoin.clicksAfterImpressionsOuter(imps, clks,
        "ad_id", "imp_ts", "click_ts", windowSeconds = 60)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    // ad 2's only click is out-of-window → null row in batch too
    assert(out === Set((1L, 45000000L), (2L, -1L)))
  }

  test("the same predicate on batch frames gives the reference result") {
    val imps = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:30"))).toDF("ad_id", "imp_ts")
    val clks = Seq((1L, ts("2024-01-01 10:00:45")),
      (2L, ts("2024-01-01 10:01:31"))).toDF("ad_id", "click_ts")
    val out = StreamJoin.clicksAfterImpressions(imps, clks,
        "ad_id", "imp_ts", "click_ts", windowSeconds = 60)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 45000000L)))
  }

  test("stream-static enrichment: left join keeps unmatched events, no state") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "electronics"), (2L, "books")).toDF("product_id", "category")
    val events = MemoryStream[(Long, Double)]
    val q = StreamJoin.enrichWithDim(
        events.toDF().toDF("product_id", "amount"), dim, "product_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      events.addData((1L, 10.0), (9L, 5.0)) // 9 has no dim row
      q.processAllAvailable()
      events.addData((2L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toSet
      assert(rows === Set(
        (1L, Some("electronics")), (9L, None), (2L, Some("books"))))
      // stateless by construction: a static side means no state store
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate streaming state")
    } finally q.stop()
  }

  test("enrichWithDim batch plan broadcasts the dim (stream side never shuffles)") {
    val dim = Seq((1L, "a")).toDF("k", "v")
    val facts = spark.range(0, 1000).select(col("id").as("k"))
    val p = StreamJoin.enrichWithDim(facts, dim, "k")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("refreshedDimEachBatch picks up an in-place dim overwrite mid-stream") {
    // The measured fact (commit a589dd3): a parquet dim joined as a
    // static side is snapshot-pinned at plan time, and overwriting it
    // mid-stream kills the query with FILE_NOT_EXIST. This test pins
    // the SUPPORTED refresh route: a fresh spark.read inside
    // foreachBatch sees each micro-batch's current dim contents.
    implicit val sql = spark.sqlContext
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft-dim-refresh").toString + "/dim"
    Seq((1L, "v1")).toDF("product_id", "label")
      .repartition(1).write.mode("overwrite").parquet(dimPath)

    val events = MemoryStream[(Long, Double)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Double, Option[String])]()
    val q = events.toDF().toDF("product_id", "amount").writeStream
      .outputMode("append")
      .foreachBatch(StreamJoin.refreshedDimEachBatch(
        s => s.read.parquet(dimPath), "product_id") { (enriched, _) =>
        seen.synchronized {
          seen ++= enriched.collect().map(r =>
            (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
        }
      })
      .start()
    try {
      events.addData((1L, 10.0), (2L, 5.0))
      q.processAllAvailable()
      // in-place overwrite: new label for 1, NEW key 2 — the exact
      // mutation that FILE_NOT_EXISTs the static-join route
      Seq((1L, "v2"), (2L, "b1")).toDF("product_id", "label")
        .repartition(1).write.mode("overwrite").parquet(dimPath)
      events.addData((1L, 20.0), (2L, 6.0))
      q.processAllAvailable()
      val got = seen.synchronized(seen.toSet)
      assert(got === Set(
        (1L, 10.0, Some("v1")), (2L, 5.0, None),   // batch 1: old dim
        (1L, 20.0, Some("v2")), (2L, 6.0, Some("b1")))) // batch 2: refreshed
    } finally q.stop()
  }
}
