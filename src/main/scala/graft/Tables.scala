package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every reader is a plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom: column pruning and predicate pushdown reach the
  * parquet scan of whatever query is layered on top. Do NOT `.cache()`
  * here — at 100 TB the tables don't fit, and caching defeats pushdown.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture timestamps are naive micros and must read as TimestampType
    // (not TIMESTAMP_NTZ) — see GraftSession for why this is a reader
    // setting, not a cast. Scoped to THIS read via the per-reader parquet
    // option so a caller-provided session's config (and its later reads
    // of genuine NTZ data) is left untouched; pushdown is unaffected.
    spark.read.option("inferTimestampNTZ", "false").parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS,false); Spark reads it as
    * Long under `spark.sql.legacy.parquet.nanosAsLong` (TimestampType is µs
    * precision). Normalize to TimestampType by truncating nanos → micros,
    * matching DuckDB's ns→µs cast. Cheap: one codegen'd division, no shuffle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The flag is set at session construction (GraftSession.tuned); this
    // guarded FALLBACK keeps the reader self-sufficient on a
    // caller-provided vanilla session (the driver smoke-checks entry()
    // with its own SparkSession) — without it Spark 4 refuses
    // TIMESTAMP(NANOS) parquet outright. No-op when already set.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // INTEGER division, not `/`: the ns longs (~1.7e18) exceed
        // double's 53-bit mantissa, so `col/1000` rounds ~15% of rows
        // up by 1 µs before floor() can truncate — diverging from
        // DuckDB's exact ns→µs truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
