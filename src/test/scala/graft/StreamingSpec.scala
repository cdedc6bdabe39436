package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EcommerceStreamJob

/** R1–R3 streaming parity: the running aggregations in update mode must
  * converge to the same end-state as Flink's per-record keyed reduce
  * (`DataStreamJob.java:133-163`), regardless of micro-batch boundaries. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def jsonTx(id: String, cat: String, amt: Double, ts: String): String =
    s"""{"transactionId":"$id","productId":"p1","productName":"laptop",
       |"productCategory":"$cat","productPrice":$amt,"productQuantity":1,
       |"productBrand":"apple","totalAmount":$amt,"currency":"USD",
       |"customerId":"c1","transactionDate":"$ts",
       |"paymentMethod":"credit_card"}""".stripMargin.replaceAll("\n", "")

  test("category running totals converge across micro-batches (update mode)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF().withColumnRenamed("value", "value"))
    val agg = EcommerceStreamJob.categoryAgg(tx)

    val query = agg.writeStream
      .format("memory")
      .queryName("cat_totals")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: two categories
      input.addData(
        jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
        jsonTx("t2", "fashion", 4.0, "2024-11-08T11:00:00.000000"))
      query.processAllAvailable()
      // batch 2: electronic grows — update mode re-emits the full total
      input.addData(jsonTx("t3", "electronic", 2.5, "2024-11-09T09:00:00.000000"))
      query.processAllAvailable()

      // upsert end-state = latest emission per key (exactly what the
      // ON CONFLICT ... SET total_sales = EXCLUDED.total_sales sink does)
      val endState = spark.table("cat_totals")
        .groupBy($"category")
        .agg(org.apache.spark.sql.functions.max($"total_sales").as("total_sales"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(endState === Map("electronic" -> 12.5, "fashion" -> 4.0))
      // first-seen date sticks per key (reference quirk #2: keyed by
      // category only, date carried from first record)
      val dates = spark.table("cat_totals")
        .filter($"category" === "electronic")
        .select($"transaction_date").distinct()
        .collect().map(_.getDate(0).toString).toSet
      assert(dates === Set("2024-11-08"))
    } finally query.stop()
  }

  test("day and month aggs run in update mode and converge") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val tx = EcommerceStreamJob.parse(input.toDF())
    val day = EcommerceStreamJob.dayAgg(tx).writeStream
      .format("memory").queryName("day_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        jsonTx("t1", "electronic", 10.0, "2024-11-08T10:00:00.000000"),
        jsonTx("t2", "fashion", 4.0, "2024-11-08T11:00:00.000000"),
        jsonTx("t3", "grocery", 6.0, "2024-11-09T09:00:00.000000"))
      day.processAllAvailable()
      val out = spark.table("day_totals")
        .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
      assert(out === Map("2024-11-08" -> 14.0, "2024-11-09" -> 6.0))
    } finally day.stop()
  }

  test("rawForDb projects to the reference's Postgres column names") {
    val tx = Json_fixture()
    val cols = EcommerceStreamJob.rawForDb(tx).columns.toSeq
    assert(cols === Seq("transaction_id", "product_id", "product_name",
      "product_category", "product_price", "product_quantity",
      "product_brand", "total_amount", "currency", "customer_id",
      "transaction_date", "payment_method"))
  }

  private def Json_fixture() = {
    val raw = Seq(jsonTx("t1", "electronic", 1.0, "2024-11-08T10:00:00.000000"))
      .toDF("value")
    EcommerceStreamJob.parse(raw)
  }
}
