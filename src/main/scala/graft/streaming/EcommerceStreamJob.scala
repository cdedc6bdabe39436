package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.Transaction
import graft.ingest.Json
import graft.operators.Ecommerce
import graft.sinks.JdbcUpsert
import graft.sinks.JdbcUpsert.ConnConfig

/** The end-to-end streaming job: the Spark-native counterpart of the
  * reference's single Flink dataflow (`DataStreamJob.java:84-170`).
  *
  * Topology decision (vs SURVEY.md §3's "single read + foreachBatch
  * fan-out" sketch): the three aggregations are RUNNING totals — state
  * since job start — so they must live in Structured Streaming state
  * stores (`groupBy().agg()` + `outputMode("update")`), and Spark allows
  * one streaming aggregation per query. We therefore run FOUR queries
  * over the same topic (raw copy + three aggs), each with its own
  * checkpoint. This preserves the two properties the reference relies on:
  *   - convergence: update-mode emits the full running total for every
  *     changed key each micro-batch, so the `ON CONFLICT … SET total_sales
  *     = EXCLUDED.total_sales` replace-upsert converges to the same DB
  *     end-state as Flink's per-record emission;
  *   - idempotency: replays re-write the same totals (at-least-once safe),
  *     unlike a per-batch delta + additive upsert, which double-counts.
  * Kafka serves multiple consumers from the page cache; the extra reads
  * are projection-pruned to the few columns each pipeline needs. State is
  * unwindowed and grows with key cardinality — exactly like the reference
  * (no watermark, `DataStreamJob.java:98`); cardinality here is
  * categories/days/months, i.e. tiny. For unbounded keys use the
  * watermarked variants in `Windows` instead.
  *
  * [[startAllSharedSource]] is the SINGLE-READ form of the same job
  * (SURVEY §3 option (a), reference parity `DataStreamJob.java:113-163`):
  * one query, one source read per micro-batch, all three running-total
  * families in one composite-key `flatMapGroupsWithState`, all four
  * tables written per batch from one persisted frame. Same DB end-state
  * (SharedSourceStreamSpec proves it batch-for-batch); pick by trade —
  * read amplification (shared) vs per-pipeline isolation (four-query).
  */
object EcommerceStreamJob {

  /** Config surface mirroring the reference's parameters
    * (`DataStreamJob.java:71-78`: kafka servers, topic, group, db url/user/
    * password — note the reference swaps user/password keys at `:108-109`;
    * we do not reproduce that bug). */
  /** `checkpointRoot` is deliberately required (no default): the
    * running totals live in the checkpointed state store, and a
    * non-durable location (e.g. /tmp) means a host restart resets the
    * totals and the replace-upserts then overwrite the accumulated DB
    * values with small restarted ones.
    *
    * `groupId` empty ⇒ let Spark generate a UNIQUE consumer group per
    * query. The four concurrent queries of this job must NOT share one
    * group id — the Spark Kafka integration warns that concurrent
    * queries in the same group interfere and each read only part of the
    * topic. Set it only for broker-side ACL requirements, and then run
    * a single query per job instance. */
  final case class JobConfig(
      checkpointRoot: String,
      kafkaServers: String = "broker:29092",
      topic: String = "financial_transactions",
      groupId: String = "",
      startingOffsets: String = "latest",
      triggerMs: Long = 200L, // reference JDBC flush cadence (DataStreamJob.java:102)
      db: ConnConfig = ConnConfig("jdbc:postgresql://localhost:5432/postgres",
        "postgres", "postgres"))

  /** S1: Kafka source (`DataStreamJob.java:89-95`). Value-only consumption,
    * latest offsets — matching `OffsetsInitializer.latest()`.
    *
    * NOTE: requires the `spark-sql-kafka-0-10` connector on the runtime
    * classpath (standard on any Spark distribution with Kafka support;
    * NOT present in this offline build environment, where tests drive
    * the same pipelines through MemoryStream / `fileSource`). */
  /** The exact reader options `kafkaSource` passes to the connector —
    * split out as a pure function so the wiring contract is testable
    * without a broker or the connector jar (KafkaContractSpec). What
    * remains unverified offline is only the connector's own behavior
    * (broker I/O, offset tracking), not our option plumbing. */
  def kafkaSourceOptions(cfg: JobConfig): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> cfg.kafkaServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets)
    if (cfg.groupId.nonEmpty) base + ("kafka.group.id" -> cfg.groupId) else base
  }

  def kafkaSource(spark: SparkSession, cfg: JobConfig): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(cfg))
      .load()

  /** Connector-free source for local/offline runs: a directory of JSON
    * lines, one transaction per line — same `value: string` contract as
    * the Kafka source, so every downstream pipeline is source-agnostic. */
  def fileSource(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format("text")
      .options(options) // e.g. maxFilesPerTrigger to bound micro-batch size
      .load(dir)
      .select(col("value"))

  // ---- pure pipeline builders (source-agnostic: batch, Memory, Kafka) ----

  /** D1: bytes → typed transactions, invalid records dropped. */
  def parse(raw: DataFrame): DataFrame =
    Json.validTransactions(Json.parseTransactions(raw))

  /** Pipeline B: running sales per category (M1/K1/R1 semantics incl. the
    * first-seen-date quirk). */
  def categoryAgg(tx: DataFrame): DataFrame =
    Ecommerce.salesPerCategoryFaithful(tx, "transactionDate",
      "productCategory", "totalAmount")

  /** Pipeline C/day. */
  def dayAgg(tx: DataFrame): DataFrame =
    Ecommerce.salesPerDay(tx, "transactionDate", "totalAmount")

  /** Pipeline C/month (faithful month-only key, first-seen year). */
  def monthAgg(tx: DataFrame): DataFrame =
    Ecommerce.salesPerMonthFaithful(tx, "transactionDate", "totalAmount")

  /** Raw transactions projected to the DB column names
    * (`DataStreamJob.java:318-331`). */
  def rawForDb(tx: DataFrame): DataFrame =
    tx.select(
      col("transactionId").as("transaction_id"),
      col("productId").as("product_id"),
      col("productName").as("product_name"),
      col("productCategory").as("product_category"),
      col("productPrice").as("product_price"),
      col("productQuantity").as("product_quantity"),
      col("productBrand").as("product_brand"),
      col("totalAmount").as("total_amount"),
      col("currency").as("currency"),
      col("customerId").as("customer_id"),
      col("transactionDate").as("transaction_date"),
      col("paymentMethod").as("payment_method"))

  // ---- wiring ----

  private def upsertEachBatch(table: String, keys: Seq[String], cfg: JobConfig)(
      batch: DataFrame, batchId: Long): Unit =
    JdbcUpsert.upsert(batch, table, keys, cfg.db)

  /** The four pipelines of the job as (queryName, transform, outputMode,
    * targetTable, upsertKeys) — the single topology description both
    * `startAll` (JDBC) and tests (captured sinks) wire up.
    * Conflict targets = the table PKs (`DataStreamJob.java:280,293,307`);
    * the faithful aggs pin date/year per key, so the full-PK conflict
    * target hits the same row every update. */
  val pipelines: Seq[(String, DataFrame => DataFrame, String, String, Seq[String])] = Seq(
    ("raw_transactions", rawForDb _, "append", "transactions", Seq("transaction_id")),
    ("sales_per_category", categoryAgg _, "update", "sales_per_category",
      Seq("transaction_date", "category")),
    ("sales_per_day", dayAgg _, "update", "sales_per_day", Seq("transaction_date")),
    ("sales_per_month", monthAgg _, "update", "sales_per_month", Seq("year", "month"))
  )

  /** Start the full topology with a custom per-batch sink — the test
    * seam. `sink(table, keys)(batchDf, batchId)` is invoked per
    * micro-batch of each pipeline. */
  def startAllWithSink(spark: SparkSession, cfg: JobConfig, source: DataFrame)(
      sink: (String, Seq[String]) => (DataFrame, Long) => Unit): Seq[StreamingQuery] = {
    val tx = parse(source)
    pipelines.map { case (name, transform, mode, table, keys) =>
      transform(tx).writeStream
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", s"${cfg.checkpointRoot}/$name")
        .trigger(Trigger.ProcessingTime(cfg.triggerMs))
        .foreachBatch(sink(table, keys))
        .start()
    }
  }

  /** Start the full job: DDL once at startup (replacing the reference's
    * no-op DDL "sinks" W1–W4), then four streaming queries upserting
    * into Postgres. */
  def startAll(spark: SparkSession, cfg: JobConfig,
      source: Option[DataFrame] = None): Seq[StreamingQuery] = {
    JdbcUpsert.runDdl(cfg.db)
    startAllWithSink(spark, cfg, source.getOrElse(kafkaSource(spark, cfg))) {
      (table, keys) => upsertEachBatch(table, keys, cfg) _
    }
  }

  // ---- single-read fan-out topology (SURVEY §3 option (a)) ----
  //
  // [[startAll]] runs FOUR independent queries over the topic — simple,
  // isolated, but 4× source read amplification and 4 consumer groups
  // where the reference reads once and fans out inside one dataflow
  // (DataStreamJob.java:113-163). The shared-source topology below is
  // that reference shape: ONE query, ONE source read per micro-batch.
  // Spark's one-streaming-aggregation-per-query limit is sidestepped by
  // observing that the three running totals are ONE keyed-state
  // computation over a composite (kind, key) space — a single
  // `flatMapGroupsWithState` maintains all three total families, and
  // the raw copy rides the same stream as stateless passthrough rows.
  // Per batch the sink receives the union of touched rows and writes
  // all four tables from one persisted frame.
  //
  // The trade: the fan-out costs one keyed shuffle of the batch
  // (4 rows per transaction — three skinny agg contributions plus the
  // raw struct), where the four-query form costs three extra source
  // reads + three shuffles of the skinny contributions. Against a real
  // broker the single read wins (network + page-cache pressure, one
  // consumer group); the four-query form remains the isolation variant
  // (one pipeline's failure/checkpoint never stalls another).

  /** One row of the composite-key fan-in stream: each parsed
    * transaction contributes one `raw` passthrough row plus three agg
    * contributions (`cat` / `day` / `mon`). Calendar fields are
    * computed with the SAME Spark SQL expressions the batch pipelines
    * use (`to_date` / `month` / `year`), so values match bit-for-bit. */
  final case class FanRow(kind: String, key: String, date: java.sql.Date,
      year: Int, amount: Double, tx: Option[Transaction])

  /** Running state per (kind, key): first-seen date/year + total —
    * exactly the reference's reduce state (first-seen quirks included:
    * category pins its first date, month its first year). */
  final case class FanState(date: java.sql.Date, year: Int, total: Double)

  /** Updated row emitted per touched (kind, key) per micro-batch. */
  final case class FanOut(kind: String, key: String, date: java.sql.Date,
      year: Int, total: Double, tx: Option[Transaction])

  /** Explode parsed transactions into the composite-key stream. */
  def fanIn(tx: DataFrame): Dataset[FanRow] = {
    val spark = tx.sparkSession
    import spark.implicits._
    tx.select(
        struct(tx.columns.map(col): _*).as("_1"),
        to_date(col("transactionDate")).as("_2"),
        month(col("transactionDate")).as("_3"),
        year(col("transactionDate")).as("_4"),
        col("productCategory").as("_5"),
        col("totalAmount").as("_6"),
        col("transactionId").as("_7"))
      .as[(Transaction, java.sql.Date, Int, Int, String, Double, String)]
      .flatMap { case (t, d, m, y, cat, amt, tid) => Seq(
        FanRow("raw", tid, d, y, amt, Some(t)),
        FanRow("cat", cat, d, y, amt, None),
        FanRow("day", d.toString, d, y, amt, None),
        FanRow("mon", m.toString, d, y, amt, None))
      }
  }

  /** The single state operator: running totals for all three agg
    * families plus stateless raw passthrough, in one keyed shuffle.
    * Update-mode emission — only (kind, key) groups touched by the
    * batch emit, carrying the full running total (the same convergence
    * contract as the four-query topology's update-mode aggs). */
  def fanState(rows: Dataset[FanRow]): Dataset[FanOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(r => (r.kind, r.key))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: (String, String), it: Iterator[FanRow],
            state: GroupState[FanState]) =>
          val (kind, key) = k
          if (kind == "raw") {
            // stateless passthrough: no state entry is ever written, so
            // per-transaction keys cost nothing beyond the shuffle
            it.map(r => FanOut("raw", key, r.date, r.year, r.amount, r.tx))
          } else {
            var st = state.getOption.orNull
            it.foreach { r =>
              st = if (st == null) FanState(r.date, r.year, r.amount)
              else st.copy(total = st.total + r.amount)
            }
            state.update(st)
            Iterator.single(FanOut(kind, key, st.date, st.year, st.total, None))
          }
      }
  }

  /** Start the single-read topology with a custom per-batch sink (the
    * same sink seam as [[startAllWithSink]], so specs drive both
    * topologies identically). One streaming query; per micro-batch the
    * union of touched rows is PERSISTED once and all four tables are
    * written from it — re-evaluation of the batch frame (the foreachBatch
    * caveat) can never re-read the source. */
  def startSharedSourceWithSink(spark: SparkSession, cfg: JobConfig,
      source: DataFrame)(
      sink: (String, Seq[String]) => (DataFrame, Long) => Unit): StreamingQuery =
    fanState(fanIn(parse(source))).toDF().writeStream
      .queryName("shared_source")
      .outputMode("update")
      .option("checkpointLocation", s"${cfg.checkpointRoot}/shared_source")
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val df = batch.persist()
        try {
          sink("transactions", Seq("transaction_id"))(
            rawForDb(df.filter(col("kind") === "raw").select(col("tx.*"))),
            batchId)
          sink("sales_per_category", Seq("transaction_date", "category"))(
            df.filter(col("kind") === "cat").select(
              col("date").as("transaction_date"),
              col("key").as("category"),
              col("total").as("total_sales")), batchId)
          sink("sales_per_day", Seq("transaction_date"))(
            df.filter(col("kind") === "day").select(
              col("date").as("transaction_date"),
              col("total").as("total_sales")), batchId)
          sink("sales_per_month", Seq("year", "month"))(
            df.filter(col("kind") === "mon").select(
              col("year"),
              col("key").cast("int").as("month"),
              col("total").as("total_sales")), batchId)
        } finally {
          df.unpersist()
          ()
        }
      }
      .start()

  /** [[startAll]]'s single-read sibling: DDL once, then ONE streaming
    * query upserting all four tables per micro-batch. */
  def startAllSharedSource(spark: SparkSession, cfg: JobConfig,
      source: Option[DataFrame] = None): StreamingQuery = {
    JdbcUpsert.runDdl(cfg.db)
    startSharedSourceWithSink(spark, cfg,
      source.getOrElse(kafkaSource(spark, cfg))) {
      (table, keys) => upsertEachBatch(table, keys, cfg) _
    }
  }
}
