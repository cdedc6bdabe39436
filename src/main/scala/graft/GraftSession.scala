package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults so Verify, Bench, the
  * streaming job, and every test agree on semantics-critical settings.
  */
object GraftSession {

  /** Apply engine settings to a builder. Callers still pick master/app. */
  def tuned(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
      // SQL surface for graft's custom expressions (GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // oracle parity + the reference generator emits naive-UTC timestamps
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // runtime re-planning: partition coalescing + skew-join splitting —
      // the knobs that keep shuffles healthy at 100 TB
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // driver fixtures store events.ts as parquet INT64 TIMESTAMP(NANOS);
      // Spark's TimestampType is µs, so read nanos as Long and convert in
      // Tables.events (nanosToTimestamp) — truncation, matching DuckDB.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fixture timestamps are NAIVE micros (isAdjustedToUTC=false), which
      // Spark 4 would infer as TIMESTAMP_NTZ; read them as TimestampType
      // instead (session TZ is UTC, so the instant is identical and DuckDB
      // agrees). Done via reader inference — NOT a post-scan cast — so
      // date-range filters still push down to the parquet scan.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // keep managed-table data (bucketed tables etc.) out of the repo cwd
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")

  def local(appName: String, cpus: String): SparkSession = {
    val spark = tuned(
      SparkSession.builder().master(s"local[$cpus]").appName(appName),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
