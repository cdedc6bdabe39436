package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp, Date => SqlDate}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Idempotent JDBC upsert writer — the Spark replacement for the
  * reference's `JdbcSink.sink` branches (W5–W8,
  * `DataStreamJob.java:185-272`). `DataFrameWriter.jdbc` can only
  * append/overwrite, so upserts run through `foreachPartition`: each
  * executor task opens one connection and flushes `addBatch` groups of
  * `batchSize` (reference: batch 1000 / 5 retries,
  * `DataStreamJob.java:100-104`).
  *
  * Scale notes: connections are per-partition, not per-row; batches are
  * bounded so executor memory stays flat; delivery is at-least-once and
  * the `ON CONFLICT … DO UPDATE` makes replays idempotent — the same
  * exactly-once-in-effect story as the reference. For very wide writes,
  * `df.coalesce(k)` upstream bounds the DB connection fan-in from a
  * 1000-executor cluster.
  */
object JdbcUpsert {

  final case class ConnConfig(
      url: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 1000,
      maxRetries: Int = 5)

  /** Postgres-dialect upsert text, same shape as the reference's sink SQL
    * (`DataStreamJob.java:189-192,207-210,223-227,241-252`). */
  def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(columns.contains),
      s"key columns $keyCols must be a subset of $columns")
    val updatable = columns.filterNot(keyCols.contains)
    val setClause =
      if (updatable.isEmpty) "" // all-key table: nothing to update
      else updatable.map(c => s"$c = EXCLUDED.$c").mkString(" SET ", ", ", "")
    val action = if (updatable.isEmpty) "DO NOTHING" else s"DO UPDATE$setClause"
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $action"
  }

  /** The four table DDLs the reference issues (it abuses no-op JDBC sinks
    * for this, W1–W4 `DataStreamJob.java:274-337`; we run them ONCE at
    * startup over a plain connection — not per batch flush). */
  val referenceDdl: Seq[String] = Seq(
    """CREATE TABLE IF NOT EXISTS transactions (
       transaction_id VARCHAR(255) PRIMARY KEY,
       product_id VARCHAR(255), product_name VARCHAR(255),
       product_category VARCHAR(255), product_price DOUBLE PRECISION,
       product_quantity INTEGER, product_brand VARCHAR(255),
       total_amount DOUBLE PRECISION, currency VARCHAR(255),
       customer_id VARCHAR(255), transaction_date TIMESTAMP,
       payment_method VARCHAR(255))""",
    """CREATE TABLE IF NOT EXISTS sales_per_category (
       transaction_date DATE, category VARCHAR(255),
       total_sales DOUBLE PRECISION,
       PRIMARY KEY (transaction_date, category))""",
    """CREATE TABLE IF NOT EXISTS sales_per_day (
       transaction_date DATE PRIMARY KEY, total_sales DOUBLE PRECISION)""",
    """CREATE TABLE IF NOT EXISTS sales_per_month (
       year INTEGER, month INTEGER, total_sales DOUBLE PRECISION,
       PRIMARY KEY (year, month))"""
  ).map(_.stripMargin.replaceAll("\\s+", " ").trim)

  def runDdl(cfg: ConnConfig, ddl: Seq[String] = referenceDdl): Unit = {
    val conn = connect(cfg)
    try ddl.foreach { sql =>
      val st = conn.createStatement(); try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  private def connect(cfg: ConnConfig): Connection = {
    Class.forName(cfg.driver)
    DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
  }

  /** Catalyst type → java.sql.Types, for typed NULL binding: Postgres
    * tolerates untyped `setObject(i, null)` but several drivers (Oracle,
    * older SQL Server) require `setNull(i, sqlType)`, and `ConnConfig
    * .driver` invites swapping drivers. */
  private def sqlTypeOf(dt: DataType): Int = dt match {
    case StringType    => java.sql.Types.VARCHAR
    case DoubleType    => java.sql.Types.DOUBLE
    case FloatType     => java.sql.Types.FLOAT
    case IntegerType   => java.sql.Types.INTEGER
    case LongType      => java.sql.Types.BIGINT
    case BooleanType   => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType      => java.sql.Types.DATE
    case _             => java.sql.Types.OTHER
  }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val j = i + 1
      if (row.isNullAt(i)) ps.setNull(j, sqlTypeOf(f.dataType))
      else f.dataType match {
        case StringType    => ps.setString(j, row.getString(i))
        case DoubleType    => ps.setDouble(j, row.getDouble(i))
        case FloatType     => ps.setFloat(j, row.getFloat(i))
        case IntegerType   => ps.setInt(j, row.getInt(i))
        case LongType      => ps.setLong(j, row.getLong(i))
        case BooleanType   => ps.setBoolean(j, row.getBoolean(i))
        case TimestampType => ps.setTimestamp(j, row.getAs[Timestamp](i))
        case DateType      => ps.setDate(j, row.getAs[SqlDate](i))
        case _             => ps.setObject(j, row.get(i))
      }
    }

  // ----- effectively-exactly-once epoch ledger -----

  /** The epoch ledger: one row per (query, epoch, partition) applied.
    * The reference's sink is at-least-once + idempotent upserts
    * (`DataStreamJob.java:100-104`) — replays converge because every
    * write is a keyed REPLACE. An ADDITIVE sink (plain INSERT, counters
    * via `value = value + EXCLUDED.value`, append-only fact tables) has
    * no such convergence: a replayed micro-batch doubles its rows. The
    * ledger closes that gap. */
  val ledgerTable = "graft_epoch_ledger"
  val ledgerDdl: String =
    s"""CREATE TABLE IF NOT EXISTS $ledgerTable (
       query_id VARCHAR(255), epoch_id BIGINT, partition_id INTEGER,
       PRIMARY KEY (query_id, epoch_id, partition_id))"""
      .stripMargin.replaceAll("\\s+", " ").trim
  val ledgerInsertSql: String =
    s"INSERT INTO $ledgerTable (query_id, epoch_id, partition_id) " +
      "VALUES (?, ?, ?) " +
      "ON CONFLICT (query_id, epoch_id, partition_id) DO NOTHING"

  /** Keyless additive insert text — the non-idempotent shape the epoch
    * ledger exists for. */
  def appendSql(table: String, columns: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")})"

  /** Effectively-exactly-once ADDITIVE write: append every row of `df`
    * to `table`, applying each (query, epoch, partition) at most once
    * across any number of replays.
    *
    * Per partition, ONE transaction: claim the ledger row
    * (`ON CONFLICT DO NOTHING`, `executeUpdate` → 0 means this
    * partition's slice of this epoch already committed — skip), then
    * stage every row batch, then commit — ledger claim and data rows
    * become visible ATOMICALLY, so a crash at any point leaves either
    * nothing (retry re-applies) or everything (retry skips). Unlike
    * [[upsert]], there is NO in-task retry: the transaction spans the
    * partition, so the retry unit is the Spark task (rollback + throw;
    * the re-executed task gets a fresh iterator and the ledger decides
    * afresh). Batches still bound memory — `executeBatch` per group,
    * one `commit` at the end.
    *
    * Exactly-once granularity is per PARTITION: it requires the
    * epoch's partitioning to be deterministic across replays (true for
    * a deterministic foreachBatch pipeline replayed from checkpointed
    * offsets on the same topology). Where topology can change between
    * retries, `df.repartition(n, stableKeyCols)` pins the layout, or
    * `coalesce(1)` buys unconditional exactly-once for small deltas.
    * Call [[runDdl]] with [[ledgerDdl]] once at startup. */
  def appendExactlyOnce(df: DataFrame, table: String, cfg: ConnConfig,
      queryId: String, epochId: Long): Unit = {
    val schema = df.schema
    val sql = appendSql(table, schema.fieldNames.toSeq)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var conn: Connection = null
        try {
          conn = connect(cfg)
          conn.setAutoCommit(false)
          val lg = conn.prepareStatement(ledgerInsertSql)
          val claimed = try {
            lg.setString(1, queryId); lg.setLong(2, epochId); lg.setInt(3, pid)
            lg.executeUpdate()
          } finally lg.close()
          if (claimed == 1) {
            val ps = conn.prepareStatement(sql)
            try rows.grouped(cfg.batchSize).foreach { group =>
              group.foreach { row => bind(ps, row, schema); ps.addBatch() }
              ps.executeBatch()
            } finally ps.close()
          }
          conn.commit()
        } catch {
          case e: Throwable =>
            if (conn != null) { try conn.rollback() catch { case _: Throwable => () } }
            throw e
        } finally {
          if (conn != null) { try conn.close() catch { case _: Throwable => () } }
        }
      }
    }
  }

  /** [[appendExactlyOnce]] in `foreachBatch` shape:
    * `stream.writeStream.foreachBatch(JdbcUpsert.foreachBatchAppend(
    * "t", cfg, "orders-agg")) …` — epoch_id is the batchId Structured
    * Streaming replays stably from the checkpoint. */
  def foreachBatchAppend(table: String, cfg: ConnConfig,
      queryId: String): (DataFrame, Long) => Unit =
    (df, epochId) => appendExactlyOnce(df, table, cfg, queryId, epochId)

  /** Upsert every row of `df` into `table`. Column order follows the
    * DataFrame schema; DataFrame column names must equal DB column names.
    *
    * Retry unit = one bounded batch group (the rows are buffered, so a
    * replay rebinds from the buffer — never from the already-consumed
    * partition iterator). Upserts make replays idempotent, so batch-level
    * at-least-once is safe. A failed attempt reopens the connection.
    */
  def upsert(df: DataFrame, table: String, keyCols: Seq[String],
      cfg: ConnConfig): Unit = {
    val schema = df.schema
    val sql = upsertSql(table, schema.fieldNames.toSeq, keyCols)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        var conn: Connection = null
        def closeQuietly(): Unit =
          if (conn != null) { try conn.close() catch { case _: Throwable => () }; conn = null }
        try {
          rows.grouped(cfg.batchSize).foreach { group =>
            var attempt = 0
            var done = false
            var last: Throwable = null
            while (!done && attempt <= cfg.maxRetries) {
              // the RECONNECT is part of the retried attempt: a refused
              // connection during a DB outage must consume one retry
              // (with backoff), not escape the loop and fail the task
              try {
                if (conn == null) { conn = connect(cfg); conn.setAutoCommit(false) }
                val ps = conn.prepareStatement(sql)
                try {
                  group.foreach { row => bind(ps, row, schema); ps.addBatch() }
                  ps.executeBatch(); conn.commit()
                  done = true
                } finally ps.close()
              } catch {
                case e: java.sql.SQLException =>
                  last = e; attempt += 1
                  if (conn != null) { try conn.rollback() catch { case _: Throwable => () } }
                  closeQuietly()
                  if (attempt <= cfg.maxRetries) {
                    // linear backoff, starting at the reference's flush
                    // cadence (200 ms) — gives a restarting DB a window
                    Thread.sleep(200L * attempt)
                  }
              }
            }
            if (!done) throw last
          }
        } finally closeQuietly()
      }
    }
  }
}
