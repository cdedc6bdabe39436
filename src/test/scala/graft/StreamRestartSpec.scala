package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.streaming.Windows

/** Checkpoint-restart and late-data semantics for the watermarked
  * streaming operators — the part MemoryStream specs cannot reach:
  * MemoryStream state dies with the query, so only a replayable source
  * (file stream) + checkpoint + a real stop/start can adjudicate that
  *   (a) restarts restore watermark + state and never re-emit output
  *       (the parquet sink's exactly-once contract),
  *   (b) rows arriving behind the restored watermark are dropped, and
  *   (c) dedup state really is evicted once the watermark passes its
  *       horizon (bounded state is a fact, not a comment).
  *
  * The reference has no restart story at all (no checkpointing config —
  * absence in `DataStreamJob.java:84-170`; at-least-once + idempotent
  * upserts); these specs pin the stronger contract our watermarked
  * variants add on top.
  */
class StreamRestartSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("key", StringType),
    StructField("amount", DoubleType),
    StructField("ts", TimestampType)))

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private var fileSeq = 0
  /** One JSON-lines file per call — with maxFilesPerTrigger=1 each file
    * becomes its own micro-batch, so watermark advancement between
    * files is deterministic. FileStreamSource orders new files by
    * modification time, and back-to-back writes can land in the same
    * filesystem timestamp tick — so each file gets an explicit,
    * strictly increasing mtime; without it the watermark-pusher file
    * could race ahead of its data file and drop rows as late. */
  private def writeFile(dir: Path, rows: Seq[(String, String, Double, String)]): Unit = {
    fileSeq += 1
    val lines = rows.map { case (id, key, amount, ts) =>
      s"""{"id":"$id","key":"$key","amount":$amount,"ts":"$ts"}"""
    }
    val p = Files.write(dir.resolve(f"batch_$fileSeq%04d.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + fileSeq * 10000L))
  }

  private def fileStream(dir: Path): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(dir.toString)

  /** Run `build` over the file stream until all current input is
    * processed (plus any watermark-commit no-data batch), then stop. */
  private def runOnce(in: Path, out: Path, cp: Path,
      build: DataFrame => DataFrame): Unit = {
    val q = build(fileStream(in)).writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", cp.toString)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("session windows survive restart: no re-emission, late rows dropped") {
    val (in, out, cp) = (tmp("sr_in"), tmp("sr_out"), tmp("sr_cp"))
    def sessions(df: DataFrame): DataFrame =
      Windows.sessionRevenue(df, "ts", "key", "amount",
        gap = "30 minutes", watermark = "1 hour")

    // u1: two events 10 min apart -> one session [10:00, 10:40);
    // u2: one event -> session [10:00, 10:30)
    writeFile(in, Seq(
      ("e1", "u1", 10.0, "2024-11-08 10:00:00"),
      ("e2", "u1", 5.0, "2024-11-08 10:10:00"),
      ("e3", "u2", 3.0, "2024-11-08 10:00:00")))
    // separate file = separate batch: pushes the watermark to 11:00,
    // past both session ends, so both sessions close and emit
    writeFile(in, Seq(("e4", "adv", 1.0, "2024-11-08 12:00:00")))
    runOnce(in, out, cp, sessions)

    val afterFirst = spark.read.parquet(out.toString)
      .collect().map(r => (r.getAs[String]("session_key"),
        r.getAs[Double]("total_sales"))).toSet
    assert(afterFirst === Set(("u1", 15.0), ("u2", 3.0)),
      "both sessions emit exactly once before the restart")

    // while the query is DOWN: a late u1 row far behind the checkpointed
    // watermark (11:00), plus a watermark pusher that closes adv's session
    writeFile(in, Seq(("late", "u1", 100.0, "2024-11-08 10:05:00")))
    writeFile(in, Seq(("e5", "adv2", 1.0, "2024-11-08 14:00:00")))
    runOnce(in, out, cp, sessions)

    val rows = spark.read.parquet(out.toString)
      .collect().map(r => (r.getAs[String]("session_key"),
        r.getAs[Double]("total_sales")))
    // the late row must neither re-open u1's closed session nor create a
    // new one; the restart must not duplicate the already-emitted rows;
    // adv's session closes under the restored-and-advanced watermark.
    // adv2's own session never closes (nothing later), so it is absent.
    assert(rows.sorted === Seq(("adv", 1.0), ("u1", 15.0), ("u2", 3.0)),
      s"exactly one row per closed session, late row dropped; got ${rows.toSeq}")
  }

  test("dedup state survives restart and is evicted past the horizon") {
    val (in, out, cp) = (tmp("dr_in"), tmp("dr_out"), tmp("dr_cp"))
    def dedup(df: DataFrame): DataFrame =
      Windows.dedupWithinWatermark(df, Seq("id"), "ts", watermark = "1 hour")

    writeFile(in, Seq(
      ("A", "k", 1.0, "2024-11-08 10:00:00"),
      ("B", "k", 2.0, "2024-11-08 10:00:00"),
      ("A", "k", 1.0, "2024-11-08 10:01:00"))) // in-batch replay: dropped
    runOnce(in, out, cp, dedup)
    assert(spark.read.parquet(out.toString)
      .collect().map(_.getAs[String]("id")).sorted === Seq("A", "B"))

    // while DOWN: another A replay, still within the dedup horizon of
    // the checkpointed state -> must be dropped by the RESTORED state;
    // C advances the watermark to 12:00, evicting A's entry (10:01 + 1h
    // horizon < 12:00) at the end of its batch
    writeFile(in, Seq(("A", "k", 1.0, "2024-11-08 10:02:00")))
    writeFile(in, Seq(("C", "k", 3.0, "2024-11-08 13:00:00")))
    runOnce(in, out, cp, dedup)
    assert(spark.read.parquet(out.toString)
      .collect().map(_.getAs[String]("id")).sorted === Seq("A", "B", "C"),
      "cross-restart replay dropped by restored state")

    // A returns AFTER its state was evicted: emitted again — bounded
    // state trades unbounded-horizon dedup for state ≈ keys within the
    // watermark, exactly the documented contract
    writeFile(in, Seq(("A", "k", 1.0, "2024-11-08 13:01:00")))
    runOnce(in, out, cp, dedup)
    val ids = spark.read.parquet(out.toString)
      .collect().map(_.getAs[String]("id")).sorted
    assert(ids === Seq("A", "A", "B", "C"),
      "post-eviction arrival is a NEW observation, not a duplicate")
  }

  test("Trigger.AvailableNow: backfill terminates by itself in bounded batches; incremental rerun emits only new windows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val (in, out, cp) = (tmp("an_in"), tmp("an_out"), tmp("an_cp"))

    def agg(df: DataFrame): DataFrame =
      df.withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 day").as("w"), col("key"))
        .agg(sum(col("amount")).as("total"))
        .select(col("w.start").as("window_start"), col("key"), col("total"))

    def runAvailableNow(): (Boolean, Int) = {
      val q = agg(fileStream(in)).writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      // the operational contract: the query DRAINS the backlog and
      // stops on its own — no processAllAvailable/stop babysitting
      val terminated = q.awaitTermination(120000)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      (terminated, dataBatches)
    }

    // ----- backfill: two closed days + a day-3 row that stays open
    writeFile(in, Seq(("a1", "k1", 10.0, "2024-01-01 10:00:00"),
      ("a2", "k2", 5.0, "2024-01-01 11:00:00")))
    writeFile(in, Seq(("b1", "k1", 7.0, "2024-01-02 10:00:00")))
    writeFile(in, Seq(("c1", "k1", 1.0, "2024-01-03 09:00:00")))
    val (term1, batches1) = runAvailableNow()
    assert(term1, "AvailableNow run must terminate on its own")
    // maxFilesPerTrigger=1 is honored (Trigger.Once would gulp all 3)
    assert(batches1 >= 3, s"expected >= 3 bounded batches, got $batches1")
    val afterBackfill = spark.read.parquet(out.toString)
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getString(1), r.getDouble(2))).toSet
    // watermark (03 09:00 − 30 min) closed days 1-2 only
    assert(afterBackfill === Set(("2024-01-01", "k1", 10.0),
      ("2024-01-01", "k2", 5.0), ("2024-01-02", "k1", 7.0)))

    // ----- incremental rerun from the SAME checkpoint: new files only
    writeFile(in, Seq(("c2", "k1", 2.0, "2024-01-03 10:00:00")))
    writeFile(in, Seq(("d1", "k2", 9.0, "2024-01-04 12:00:00")))
    val (term2, _) = runAvailableNow()
    assert(term2)
    val afterIncr = spark.read.parquet(out.toString)
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getString(1), r.getDouble(2)))
    // day 3 emitted once with BOTH its rows (state restored: c1 from
    // the backfill run + c2 from this one); days 1-2 NOT re-emitted
    assert(afterIncr.count(_._1 == "2024-01-01") === 2)
    assert(afterIncr.count(_._1 == "2024-01-02") === 1)
    assert(afterIncr.filter(_._1 == "2024-01-03").toSet ===
      Set(("2024-01-03", "k1", 3.0)))
  }
}
