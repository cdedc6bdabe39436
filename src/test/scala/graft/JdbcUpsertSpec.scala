package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcUpsert

/** W5–W8 parity: the upsert SQL shape must match the reference's sink
  * statements (`DataStreamJob.java:185-272`). No DB needed — the statement
  * text and DDL set are the contract. */
class JdbcUpsertSpec extends AnyFunSuite {

  test("upsert SQL matches the reference's ON CONFLICT ... DO UPDATE shape") {
    val sql = JdbcUpsert.upsertSql("sales_per_day",
      Seq("transaction_date", "total_sales"), Seq("transaction_date"))
    assert(sql ===
      "INSERT INTO sales_per_day (transaction_date, total_sales) " +
      "VALUES (?, ?) ON CONFLICT (transaction_date) " +
      "DO UPDATE SET total_sales = EXCLUDED.total_sales")
  }

  test("composite conflict target (sales_per_category PK)") {
    val sql = JdbcUpsert.upsertSql("sales_per_category",
      Seq("transaction_date", "category", "total_sales"),
      Seq("transaction_date", "category"))
    assert(sql.contains("ON CONFLICT (transaction_date, category)"))
    assert(sql.contains("SET total_sales = EXCLUDED.total_sales"))
    assert(!sql.contains("transaction_date = EXCLUDED")) // keys never updated
  }

  test("all-key table degrades to DO NOTHING") {
    val sql = JdbcUpsert.upsertSql("t", Seq("k1", "k2"), Seq("k1", "k2"))
    assert(sql.endsWith("ON CONFLICT (k1, k2) DO NOTHING"))
  }

  test("key columns must be a subset of columns") {
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertSql("t", Seq("a"), Seq("missing"))
    }
  }

  test("reference DDL covers the four Postgres tables") {
    val ddl = JdbcUpsert.referenceDdl.mkString("\n")
    Seq("transactions", "sales_per_category", "sales_per_day",
      "sales_per_month").foreach(t => assert(ddl.contains(t)))
    assert(ddl.contains("PRIMARY KEY (transaction_date, category)"))
    assert(ddl.contains("PRIMARY KEY (year, month)"))
  }
}
