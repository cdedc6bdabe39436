package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Ecommerce

class EcommerceSpec extends SparkSpec {
  import spark.implicits._

  private def tx(id: String, cat: String, amt: Double, ts: String) =
    Transaction(id, "product1", "laptop", cat, amt, 1, "apple", amt, "USD",
      "cust", Timestamp.valueOf(ts), "credit_card")

  private val fixture = Seq(
    tx("t1", "electronic", 10.0, "2024-01-01 10:00:00"),
    tx("t2", "electronic", 5.0, "2024-01-02 10:00:00"),
    tx("t3", "fashion", 7.5, "2024-01-02 11:00:00"),
    tx("t4", "fashion", 2.5, "2025-01-03 11:00:00") // same month, next year
  )

  test("salesPerCategory sums per category") {
    val out = Ecommerce
      .salesPerCategory(fixture.toDF(), "productCategory", "totalAmount")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map("electronic" -> 15.0, "fashion" -> 10.0))
  }

  test("salesPerCategoryDay keys by (date, category)") {
    val out = Ecommerce
      .salesPerCategoryDay(fixture.toDF(), "transactionDate", "productCategory",
        "totalAmount")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getDouble(2)).toMap
    assert(out === Map(
      ("2024-01-01", "electronic") -> 10.0,
      ("2024-01-02", "electronic") -> 5.0,
      ("2024-01-02", "fashion") -> 7.5,
      ("2025-01-03", "fashion") -> 2.5))
  }

  test("salesPerDay sums per calendar day") {
    val out = Ecommerce.salesPerDay(fixture.toDF(), "transactionDate", "totalAmount")
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(out === Map(
      "2024-01-01" -> 10.0, "2024-01-02" -> 12.5, "2025-01-03" -> 2.5))
  }

  test("salesPerMonthFaithful merges same month across years (reference quirk #3)") {
    val out = Ecommerce
      .salesPerMonthFaithful(fixture.toDF(), "transactionDate", "totalAmount")
      .collect()
    assert(out.length === 1) // Jan-2024 and Jan-2025 share one accumulator
    assert(out.head.getAs[Int]("month") === 1)
    assert(out.head.getAs[Double]("total_sales") === 25.0)
  }

  test("salesPerMonth keys by (year, month)") {
    val out = Ecommerce.salesPerMonth(fixture.toDF(), "transactionDate", "totalAmount")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === Map((2024, 1) -> 22.5, (2025, 1) -> 2.5))
  }

  test("sum aggregation is arrival-order independent") {
    val shuffled = scala.util.Random.shuffle(fixture)
    val a = Ecommerce.salesPerCategory(fixture.toDF(), "productCategory", "totalAmount")
      .orderBy("category").collect().toSeq
    val b = Ecommerce.salesPerCategory(shuffled.toDF(), "productCategory", "totalAmount")
      .orderBy("category").collect().toSeq
    assert(a === b)
  }

  test("latestPerKey keeps the last write per key (upsert end-state)") {
    val df = Seq(
      ("u1", 1L, "2024-01-01 10:00:00", 1.0),
      ("u1", 2L, "2024-01-01 12:00:00", 2.0),
      ("u2", 3L, "2024-01-01 09:00:00", 3.0)
    ).toDF("user", "id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Ecommerce.latestPerKey(df, Seq("user"), "ts", Seq("id"))
      .select("user", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("u1" -> 2L, "u2" -> 3L))
  }

  test("latestPerKey breaks order-key ties deterministically") {
    val df = Seq(
      ("u1", 1L, "2024-01-01 10:00:00", 1.0),
      ("u1", 2L, "2024-01-01 10:00:00", 2.0)
    ).toDF("user", "id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Ecommerce.latestPerKey(df, Seq("user"), "ts", Seq("id")).collect()
    assert(out.length === 1 && out.head.getAs[Long]("id") === 2L)
  }
}
