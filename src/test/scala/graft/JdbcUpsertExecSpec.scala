package graft

import java.sql.{Timestamp, Date => SqlDate}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.{FakeDb, JdbcUpsert}

/** Executes the W5–W8 upsert writer body (`JdbcUpsert.upsert`,
  * bind / addBatch / executeBatch / commit / retry) against a recording
  * in-memory JDBC driver ([[graft.sinks.FakeDb]]) — the round-4 verdict's
  * top gap: the SQL text was asserted but the runtime path had never run.
  *
  * Reference contract under test: `DataStreamJob.java:237-272` (per-row
  * upsert with batch 1000 / 5 retries, `:100-104`) re-expressed as
  * bounded foreachPartition batches with at-least-once + idempotent
  * replay. End-state semantics are pinned to the registered batch
  * analogue `q_latest_event_per_user` (Ecommerce.latestPerKey).
  */
class JdbcUpsertExecSpec extends SparkSpec {
  FakeDb.register()

  import spark.implicits._

  private def mkDf(n: Int) =
    spark.range(n.toLong).select(
      concat(lit("k"), col("id")).as("k"),
      (col("id") * 2).cast(IntegerType).as("v"))

  test("batch flush at exactly batchSize, executeBatch before commit, one connection per partition") {
    val db = FakeDb.fresh("flush")
    JdbcUpsert.upsert(mkDf(2500).repartition(1), "t", Seq("k"), FakeDb.cfg("flush", batchSize = 1000))

    val log = db.eventLog
    // 2500 rows / batch 1000 → group sizes 1000, 1000, 500, each its own
    // prepare + executeBatch + commit on ONE connection.
    assert(log.count(_ == "connect") === 1)
    assert(log.count(_ == "setAutoCommit:false") === 1)
    assert(log.filter(_.startsWith("executeBatch:")) === Vector(
      "executeBatch:1000", "executeBatch:1000", "executeBatch:500"))
    assert(log.count(_ == "commit") === 3)
    assert(log.count(_ == "close") === 1)
    // ordering: every executeBatch is immediately followed by its commit
    log.zipWithIndex.foreach { case (e, i) =>
      if (e.startsWith("executeBatch:")) assert(log(i + 1) === "commit", s"at $i in $log")
    }
    assert(log.last === "close")
    assert(db.rowsOf("t").size === 2500)
  }

  test("typed setNull per schema field type") {
    val db = FakeDb.fresh("nulls")
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("c_str", StringType), StructField("c_dbl", DoubleType),
      StructField("c_flt", FloatType), StructField("c_int", IntegerType),
      StructField("c_lng", LongType), StructField("c_bool", BooleanType),
      StructField("c_ts", TimestampType), StructField("c_dt", DateType)))
    val row = Row("key1", null, null, null, null, null, null, null, null)
    val df = spark.createDataFrame(java.util.List.of(row), schema)
    JdbcUpsert.upsert(df, "nt", Seq("k"), FakeDb.cfg("nulls"))

    // param index (1-based, after key at 1) → java.sql.Types constant
    val expected = Set(
      2 -> java.sql.Types.VARCHAR, 3 -> java.sql.Types.DOUBLE,
      4 -> java.sql.Types.FLOAT, 5 -> java.sql.Types.INTEGER,
      6 -> java.sql.Types.BIGINT, 7 -> java.sql.Types.BOOLEAN,
      8 -> java.sql.Types.TIMESTAMP, 9 -> java.sql.Types.DATE)
    assert(db.nullBinds.toSet === expected)
    val stored = db.rowsOf("nt").head
    assert(stored("k") === "key1")
    assert(Seq("c_str", "c_dbl", "c_flt", "c_int", "c_lng", "c_bool", "c_ts", "c_dt")
      .forall(c => stored(c) == null))
  }

  test("non-null values bind with their JDBC types and round-trip") {
    val db = FakeDb.fresh("vals")
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("c_dbl", DoubleType), StructField("c_int", IntegerType),
      StructField("c_lng", LongType), StructField("c_bool", BooleanType),
      StructField("c_ts", TimestampType), StructField("c_dt", DateType)))
    val ts = Timestamp.valueOf("2024-11-08 12:34:56.789")
    val dt = SqlDate.valueOf("2024-11-08")
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", 1.5, 7, 9L, true, ts, dt)), schema)
    JdbcUpsert.upsert(df, "vt", Seq("k"), FakeDb.cfg("vals"))
    val stored = db.rowsOf("vt").head
    assert(stored("c_dbl") === 1.5)
    assert(stored("c_int") === 7)
    assert(stored("c_lng") === 9L)
    assert(stored("c_bool") === true)
    assert(stored("c_ts") === ts)
    assert(stored("c_dt") === dt)
    assert(db.nullBinds.isEmpty)
  }

  test("executeBatch failure: rollback, reconnect, full-group rebind, no lost rows") {
    val db = FakeDb.fresh("retry")
    db.failExecuteBatches = 2
    JdbcUpsert.upsert(mkDf(300).repartition(1), "t", Seq("k"),
      FakeDb.cfg("retry", batchSize = 1000, maxRetries = 5))

    val log = db.eventLog
    assert(log.count(_ == "executeBatch:FAIL") === 2)
    // each failure rolls back and drops the connection; a fresh one serves the retry
    assert(log.count(_ == "rollback") === 2)
    assert(db.connectAttempts === 3)
    // the successful attempt re-bound the ENTIRE group from the buffer,
    // not the leftovers of a consumed iterator
    assert(log.filter(_.startsWith("executeBatch:")).last === "executeBatch:300")
    assert(log.count(_ == "commit") === 1)
    assert(db.rowsOf("t").size === 300)
    // failure ordering: FAIL → rollback → close → connect (reconnect within the loop)
    val i = log.indexOf("executeBatch:FAIL")
    assert(log.slice(i, i + 4) === Vector("executeBatch:FAIL", "rollback", "close", "connect"))
  }

  test("connection refusal consumes a retry, then succeeds") {
    val db = FakeDb.fresh("refuse")
    db.failConnects = 1
    JdbcUpsert.upsert(mkDf(10).repartition(1), "t", Seq("k"),
      FakeDb.cfg("refuse", maxRetries = 5))
    assert(db.connectAttempts === 2) // refused + succeeded
    assert(db.eventLog.count(_ == "commit") === 1)
    assert(db.rowsOf("t").size === 10)
  }

  test("retries exhausted surfaces the SQLException and commits nothing") {
    val db = FakeDb.fresh("exhaust")
    db.failExecuteBatches = 3 // attempt + 2 retries, all fail
    val e = intercept[Exception] {
      JdbcUpsert.upsert(mkDf(10).repartition(1), "t", Seq("k"),
        FakeDb.cfg("exhaust", maxRetries = 2))
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[java.sql.SQLException]))
    assert(db.eventLog.count(_ == "executeBatch:FAIL") === 3)
    assert(db.eventLog.count(_ == "commit") === 0)
    assert(db.rowsOf("t").isEmpty)
  }

  test("DO UPDATE overwrites non-key columns on replay (idempotent at-least-once)") {
    val db = FakeDb.fresh("upd")
    val first = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val second = Seq(("a", 10), ("c", 3)).toDF("k", "v")
    JdbcUpsert.upsert(first, "t", Seq("k"), FakeDb.cfg("upd"))
    JdbcUpsert.upsert(second, "t", Seq("k"), FakeDb.cfg("upd"))
    val byKey = db.rowsOf("t").map(r => r("k") -> r("v")).toMap
    assert(byKey === Map("a" -> 10, "b" -> 2, "c" -> 3))
  }

  test("all-key table: DO NOTHING keeps the first row") {
    val db = FakeDb.fresh("nothing")
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k1", "k2")
    JdbcUpsert.upsert(df.repartition(1), "t", Seq("k1", "k2"), FakeDb.cfg("nothing"))
    JdbcUpsert.upsert(df.repartition(1), "t", Seq("k1", "k2"), FakeDb.cfg("nothing"))
    assert(db.rowsOf("t").size === 2)
  }

  test("multi-partition write: one connection per non-empty partition, end-state complete") {
    val db = FakeDb.fresh("multi")
    JdbcUpsert.upsert(mkDf(1000).repartition(8), "t", Seq("k"),
      FakeDb.cfg("multi", batchSize = 100))
    assert(db.rowsOf("t").size === 1000)
    val log = db.eventLog
    assert(log.count(_ == "connect") === 8)
    assert(log.count(_ == "close") === 8)
    assert(log.count(_ == "commit") === log.count(_.startsWith("executeBatch:")))
  }

  test("upsert end-state ≡ q_latest_event_per_user (latestPerKey semantics)") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts")
    // Deterministic replay: ascending (ts, event_id) in ONE partition, so
    // "last write per user_id" is exactly latestPerKey's desc-(ts, event_id) pick.
    val ordered = events.repartition(1)
      .sortWithinPartitions(col("ts").asc, col("event_id").asc)
      .drop("ts")
    val db = FakeDb.fresh("endstate")
    JdbcUpsert.upsert(ordered, "latest", Seq("user_id"), FakeDb.cfg("endstate", batchSize = 500))

    // raw-boxed tuples on both sides: events.value is nullable, so no
    // primitive getters
    val expected = graft.operators.Ecommerce
      .latestPerKey(Tables.events(spark, sf), Seq("user_id"), "ts", Seq("event_id"))
      .select("user_id", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.get(0), r.get(1), r.get(2), r.get(3)))
      .toSet
    val got = db.rowsOf("latest")
      .map(r => (r("user_id"), r("event_id"), r("event_type"), r("value")))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("runDdl executes the four reference DDL statements once each") {
    val db = FakeDb.fresh("ddl")
    JdbcUpsert.runDdl(FakeDb.cfg("ddl"))
    val ddls = db.eventLog.filter(_.startsWith("ddl:"))
    assert(ddls === Vector("ddl:transactions", "ddl:sales_per_category",
      "ddl:sales_per_day", "ddl:sales_per_month"))
    assert(db.eventLog.last === "close")
  }

  // ----- effectively-exactly-once epoch ledger -----

  test("epoch ledger: replayed additive epoch applies exactly once") {
    val db = FakeDb.fresh("xonce")
    JdbcUpsert.runDdl(FakeDb.cfg("xonce"), Seq(JdbcUpsert.ledgerDdl))
    val df = mkDf(300).repartition(3)
    // the additive statement is a bare keyless INSERT — genuinely
    // non-idempotent (no ON CONFLICT to converge a replay)
    assert(JdbcUpsert.appendSql("facts", Seq("k", "v")) ===
      "INSERT INTO facts (k, v) VALUES (?, ?)")
    // forced FULL-EPOCH replay (restart-from-checkpoint shape): same
    // query, same epoch, same deterministic partitioning
    JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xonce"), "q1", 7L)
    assert(db.rowsOf("facts").size === 300)
    JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xonce"), "q1", 7L)
    assert(db.rowsOf("facts").size === 300, "replayed epoch must not double")
    // the next epoch and a different query both apply
    JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xonce"), "q1", 8L)
    assert(db.rowsOf("facts").size === 600)
    JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xonce"), "q2", 7L)
    assert(db.rowsOf("facts").size === 900)
    // ledger state: one row per APPLIED (query, epoch, partition) —
    // three applied epochs × three partitions; the replay adds none
    assert(db.rowsOf(JdbcUpsert.ledgerTable).size === 9)
    // replay skips are visible as executeUpdate:0 claims
    assert(db.eventLog.count(_ == "executeUpdate:0") === 3)
  }

  test("epoch ledger: mid-epoch failure rolls back rows AND claim; retry re-applies fully") {
    val db = FakeDb.fresh("xfail")
    val df = mkDf(200).repartition(1)
    db.failExecuteBatches = 1
    // no in-task retry on this path: the failure surfaces (task-retry
    // unit), with the ledger claim rolled back alongside the rows
    intercept[Exception] {
      JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xfail"), "q", 1L)
    }
    assert(db.rowsOf("facts").isEmpty, "failed epoch leaves nothing")
    assert(db.rowsOf(JdbcUpsert.ledgerTable).isEmpty, "claim rolled back")
    assert(db.eventLog.count(_ == "rollback") === 1)
    // the task retry (re-invocation) applies the epoch exactly once
    JdbcUpsert.appendExactlyOnce(df, "facts", FakeDb.cfg("xfail"), "q", 1L)
    assert(db.rowsOf("facts").size === 200)
    assert(db.rowsOf(JdbcUpsert.ledgerTable).size === 1)
  }

  test("epoch ledger: foreachBatch shape drives an exactly-once streaming append") {
    val db = FakeDb.fresh("xstream")
    val sink = JdbcUpsert.foreachBatchAppend("agg", FakeDb.cfg("xstream"), "rev-stream")
    // three epochs, the middle one delivered twice (restart replay)
    sink(Seq(("a", 1)).toDF("k", "v"), 0L)
    sink(Seq(("b", 2)).toDF("k", "v"), 1L)
    sink(Seq(("b", 2)).toDF("k", "v"), 1L)
    sink(Seq(("c", 3)).toDF("k", "v"), 2L)
    val vals = db.rowsOf("agg").map(r => (r("k"), r("v")))
    assert(vals.sortBy(_.toString) === Vector(("a", 1), ("b", 2), ("c", 3)))
  }
}
