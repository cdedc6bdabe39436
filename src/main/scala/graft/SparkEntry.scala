package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ecommerce

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure function over the driver fixtures; the `events`
  * table stands in for the reference's Kafka transaction stream
  * (FIXTURES.md §B): event_type ↔ productCategory, value ↔ totalAmount,
  * ts ↔ transactionDate. Each entry has a DuckDB-runnable oracle with
  * IDENTICAL column names and an explicit ORDER BY mirrored on the Spark
  * side, so the driver's sorted-hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sales_per_category")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- reference parity: Pipeline B (M1/K1/R1, DataStreamJob.java:123-136)
    "q_sales_per_category" -> ((s, dir) =>
      Ecommerce.salesPerCategory(Tables.events(s, dir), "event_type", "value")
        .orderBy("category")),
    // intended composite-key variant (PK (date, category), DataStreamJob.java:307)
    "q_sales_per_category_day" -> ((s, dir) =>
      Ecommerce.salesPerCategoryDay(Tables.events(s, dir), "ts", "event_type", "value")
        .orderBy("transaction_date", "category")),
    // ----- reference parity: Pipeline C/day (M2/K2/R2, DataStreamJob.java:138-153)
    "q_sales_per_day" -> ((s, dir) =>
      Ecommerce.salesPerDay(Tables.events(s, dir), "ts", "value")
        .orderBy("transaction_date")),
    // ----- reference parity: Pipeline C/month (M3/K3/R3, DataStreamJob.java:155-163)
    "q_sales_per_month" -> ((s, dir) =>
      Ecommerce.salesPerMonth(Tables.events(s, dir), "ts", "value")
        .orderBy("year", "month")),
    // faithful month-only key (quirk #3), deterministic projection
    "q_sales_per_month_of_year" -> ((s, dir) =>
      Ecommerce.salesPerMonthOfYear(Tables.events(s, dir), "ts", "value")
        .orderBy("month")),
    // ----- reference parity: raw-copy projection + pushdown filter (D1/W5)
    "q_raw_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("value") >= 100.0)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),
    // ----- reference parity: JSON field binding (D1, JSONValueDeserialization)
    "q_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),
    // ----- reference parity: upsert end-state = latest write per key (W5-W8)
    "q_latest_event_per_user" -> ((s, dir) =>
      Ecommerce.latestPerKey(Tables.events(s, dir),
          Seq("user_id"), "ts", Seq("event_id"))
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")),
    // ----- scale headliner: wide aggregate over lineitem (TPC-H Q1 shape)
    "q1_lineitem_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_sales_per_category" ->
      """SELECT event_type AS category, SUM(value) AS total_sales
         FROM events GROUP BY 1 ORDER BY category""",
    "q_sales_per_category_day" ->
      """SELECT CAST(ts AS DATE) AS transaction_date, event_type AS category,
                SUM(value) AS total_sales
         FROM events GROUP BY 1, 2 ORDER BY transaction_date, category""",
    "q_sales_per_day" ->
      """SELECT CAST(ts AS DATE) AS transaction_date, SUM(value) AS total_sales
         FROM events GROUP BY 1 ORDER BY transaction_date""",
    "q_sales_per_month" ->
      """SELECT CAST(YEAR(ts) AS INTEGER) AS year,
                CAST(MONTH(ts) AS INTEGER) AS month,
                SUM(value) AS total_sales
         FROM events GROUP BY 1, 2 ORDER BY year, month""",
    "q_sales_per_month_of_year" ->
      """SELECT CAST(MONTH(ts) AS INTEGER) AS month, SUM(value) AS total_sales
         FROM events GROUP BY 1 ORDER BY month""",
    "q_raw_events" ->
      """SELECT event_id, user_id, event_type, value
         FROM events WHERE value >= 100.0 ORDER BY event_id""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events ORDER BY event_id""",
    "q_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY date_trunc('microseconds', ts) DESC,
                                              event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id""",
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
                SUM(l_quantity) AS sum_qty,
                SUM(l_extendedprice) AS sum_base_price,
                SUM(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
                AVG(l_quantity) AS avg_qty,
                AVG(l_discount) AS avg_disc,
                COUNT(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""
  )
}
