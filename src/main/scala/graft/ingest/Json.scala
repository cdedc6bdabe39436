package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Model, Transaction}

/** JSON → Transaction binding: the Spark analogue of the reference's
  * Jackson deserializer (`JSONValueDeserializationSchema.java:21-23`).
  *
  * Everything is `from_json` against the declared schema — fully
  * codegen'd, no UDF, no driver-side parsing, so it vectorizes across
  * a 1000-executor scan. Malformed records become NULL structs
  * (PERMISSIVE mode), mirroring Jackson's exception-per-record being
  * the only failure path in the reference.
  */
object Json {

  /** The reference generator's timestamp shape:
    * `utcnow().strftime('%Y-%m-%dT%H:%M:%S.%f%z')` with empty `%z`
    * (naive UTC), e.g. `2024-11-08T12:34:56.789012`
    * (`sale-transaction-generator/main.py:24`). Spark's default lenient
    * parser accepts it, but we pin the format so behavior can't drift
    * with Spark versions.
    */
  val generatorTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  private val parseOptions = Map(
    "timestampFormat" -> generatorTimestampFormat,
    "mode" -> "PERMISSIVE")

  /** Parse a column of JSON strings into the full transaction struct and
    * flatten. Input: any DataFrame with a string column `jsonCol`.
    * Output columns = Model.transactionSchema fields. */
  def parseTransactions(df: DataFrame, jsonCol: String = "value"): DataFrame =
    df.select(
        from_json(col(jsonCol).cast("string"), Model.transactionSchema,
          parseOptions).as("t"))
      .select("t.*")

  /** Typed variant for callers that want compile-time field checks. */
  def parseTransactionsTyped(df: DataFrame, jsonCol: String = "value")(
      implicit spark: SparkSession): Dataset[Transaction] = {
    import spark.implicits._
    parseTransactions(df, jsonCol).as[Transaction]
  }

  /** Drop records Jackson would have thrown on (all-null struct ⇒
    * unparseable, or missing the PK) AND records without a parseable
    * event time: a null transactionDate would otherwise flow into the
    * date-keyed aggregations as a NULL grouping key and then into a
    * NOT NULL Postgres PK column — a poison-pill record that crash-loops
    * the sink on every checkpoint replay. Kept separate so callers
    * choose dead-letter handling instead of silent drops. */
  def validTransactions(parsed: DataFrame): DataFrame =
    parsed.filter(
      col("transactionId").isNotNull && col("transactionDate").isNotNull)

  /** Object → JSON string (reference `JsonUtil.java:10-16`, used for the
    * ES `_source` payload). Pins the same timestampFormat as the parse
    * side so emitted JSON is re-parseable (round-trip safe). */
  def toJsonColumn(df: DataFrame): DataFrame =
    df.withColumn("json",
      to_json(struct(df.columns.map(col): _*),
        Map("timestampFormat" -> generatorTimestampFormat)))
}
