package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.ModernState
import graft.streaming.ModernState.KeyedAmount

/** transformWithState (Spark 4 arbitrary-state v2, RocksDB-backed):
  * the reference's running per-key reduce on the modern API. */
class ModernStateSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("runningSumPerKey accumulates across micro-batches (quirk #2 semantics)") {
    withRocksDb {
      implicit val sql = spark.sqlContext
      val input = MemoryStream[KeyedAmount]
      val out = ModernState.runningSumPerKey(input.toDS())
      val q = out.writeStream.format("memory").queryName("modern_running")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(KeyedAmount("toys", 10.0), KeyedAmount("toys", 5.0),
          KeyedAmount("books", 2.0))
        q.processAllAvailable()
        input.addData(KeyedAmount("toys", 1.0), KeyedAmount("games", 7.0))
        q.processAllAvailable()

        val rows = spark.table("modern_running").as[KeyedAmount].collect()
        // batch 1: one fold per key; batch 2: totals carry the state
        assert(rows.count(_.key == "toys") === 2)
        assert(rows.filter(_.key == "toys").map(_.amount).sorted.toSeq
          === Seq(15.0, 16.0))
        assert(rows.filter(_.key == "books").map(_.amount).toSeq === Seq(2.0))
        assert(rows.filter(_.key == "games").map(_.amount).toSeq === Seq(7.0))
      } finally q.stop()
    }
  }

  test("one emission per key per batch, not per input record") {
    withRocksDb {
      implicit val sql = spark.sqlContext
      val input = MemoryStream[KeyedAmount]
      val out = ModernState.runningSumPerKey(input.toDS())
      val q = out.writeStream.format("memory").queryName("modern_fold")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData((1 to 20).map(i => KeyedAmount("k", i.toDouble)): _*)
        q.processAllAvailable()
        val rows = spark.table("modern_fold").as[KeyedAmount].collect()
        assert(rows.toSeq === Seq(KeyedAmount("k", 210.0)))
      } finally q.stop()
    }
  }

  test("TTL'd state is evicted by the store: idle key restarts from zero") {
    withRocksDb {
      implicit val sql = spark.sqlContext
      val input = MemoryStream[KeyedAmount]
      val out = ModernState.runningSumPerKey(input.toDS(),
        ttl = org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(500)))
      val q = out.writeStream.format("memory").queryName("modern_ttl")
        .outputMode(OutputMode.Update()).start()
      try {
        // ProcessingTime mode keeps scheduling timer batches, so
        // processAllAvailable never quiesces — poll the sink instead
        def sinkSums(): Seq[Double] = spark.table("modern_ttl")
          .as[KeyedAmount].collect().map(_.amount).sorted.toSeq
        def awaitRows(n: Int): Unit = {
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (sinkSums().size < n && System.nanoTime() < deadline)
            Thread.sleep(100)
        }
        input.addData(KeyedAmount("k", 10.0))
        awaitRows(1)
        Thread.sleep(2000) // comfortably past the 500 ms TTL
        input.addData(KeyedAmount("k", 1.0))
        awaitRows(2)
        // expired state is not read back: second batch restarts at 0
        assert(sinkSums() === Seq(1.0, 10.0))
      } finally q.stop()
    }
  }

  test("state survives a checkpoint restart: second run resumes the sums") {
    withRocksDb {
      import java.nio.file.Files
      val in = Files.createTempDirectory("tws_in"); in.toFile.deleteOnExit()
      val cp = Files.createTempDirectory("tws_cp"); cp.toFile.deleteOnExit()
      val got = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
      var fileSeq = 0
      def writeFile(rows: Seq[(String, Double)]): Unit = {
        fileSeq += 1
        val p = Files.write(in.resolve(f"b_$fileSeq%03d.json"),
          rows.map { case (k, a) => s"""{"key":"$k","amount":$a}""" }
            .mkString("\n").getBytes("UTF-8"))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(1700000000000L + fileSeq * 10000L))
      }
      def runOnce(): Unit = {
        val ds = spark.readStream
          .schema("key STRING, amount DOUBLE")
          .json(in.toString)
          .as[ModernState.KeyedAmount]
        val q = ModernState.runningSumPerKey(ds).writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[ModernState.KeyedAmount], id: Long) =>
            val rows = batch.collect()
            got.synchronized { got ++= rows.map(r => (id, r.key, r.amount)) }
            ()
          }
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", cp.toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      writeFile(Seq(("toys", 10.0), ("toys", 5.0), ("books", 2.0)))
      runOnce()
      assert(got.synchronized(got.toSet.map((t: (Long, String, Double)) => (t._2, t._3)))
        === Set(("toys", 15.0), ("books", 2.0)))
      // second run, SAME checkpoint: the RocksDB state must be restored,
      // so toys resumes from 15 — and books, untouched this run, must
      // not re-emit (update mode emits touched keys only)
      writeFile(Seq(("toys", 1.0)))
      runOnce()
      val second = got.synchronized(got.filter(_._1 > 0).map(t => (t._2, t._3)).toSet)
      assert(second === Set(("toys", 16.0)),
        s"restored state should continue the fold, got $second")
    }
  }
}
