package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (the Deequ-style contract
  * surface, public methodology; independent implementation): a check
  * suite compiles to a handful of aggregations and emits one verdict
  * row per check — the gate a pipeline runs BEFORE publishing a table.
  *
  * Scale shape: every row-local check (completeness, range,
  * non-negativity, pattern) folds into ONE aggregation pass over the
  * frame — adding checks adds columns to the agg, not scans.
  * Uniqueness is its own exact two-level aggregation (distinct count),
  * referential integrity one left-anti broadcast-able join per
  * relation. All metrics are exact integer-count ratios, so the
  * pass/fail comparison is engine-exact (counts divide identically),
  * never a float boundary.
  *
  * Output: (check, metric, passed) — long format, one row per check.
  */
object DataQuality {

  sealed trait Check { def name: String }
  /** Row count must be ≥ `minRows` — the explicit emptiness/truncation
    * guard. The ratio checks below are VACUOUSLY TRUE on an empty
    * frame (zero rows violate nothing); a pipeline that must not
    * publish an empty table states that with MinRows, not by reading
    * tea leaves from a 0/0. */
  final case class MinRows(name: String, minRows: Long) extends Check
  /** Fraction of non-null values in `column` must be ≥ `minRatio`. */
  final case class Completeness(name: String, column: String,
      minRatio: Double = 1.0) extends Check
  /** Fraction of rows with `lo ≤ column ≤ hi` (nulls fail) ≥ `minRatio`. */
  final case class InRange(name: String, column: String, lo: Double,
      hi: Double, minRatio: Double = 1.0) extends Check
  /** distinct(columns) / rows must equal 1 (within ≥ `minRatio`). */
  final case class Uniqueness(name: String, columns: Seq[String],
      minRatio: Double = 1.0) extends Check
  /** Fraction of (non-null) `fkColumn` values present in `pk` ≥
    * `minRatio`. The dimension side is aggregated to distinct keys
    * before the join — broadcast at any sane dimension size. */
  final case class ReferentialIntegrity(name: String, fkColumn: String,
      dim: DataFrame, pkColumn: String, minRatio: Double = 1.0)
    extends Check

  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val spark = df.sparkSession
    import spark.implicits._

    // one aggregation pass for every row-local check (incl. MinRows,
    // which reads the same count). Ratio metrics coalesce to 1.0 on an
    // empty frame — vacuously true, never a NULL verdict.
    val rowLocal = checks.collect {
      case Completeness(n, c, r) =>
        (n, r, sum(when(col(c).isNotNull, 1L).otherwise(0L)))
      case InRange(n, c, lo, hi, r) =>
        (n, r, sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)))
    }
    val minRows = checks.collect { case MinRows(n, m) => (n, m) }
    val localVerdicts: Seq[DataFrame] =
      if (rowLocal.isEmpty && minRows.isEmpty) Seq.empty
      else {
        val aggd = df.agg(count(lit(1)).as("__n"),
          rowLocal.map { case (n, _, e) => e.as(s"__c_$n") }: _*)
        rowLocal.map { case (n, minR, _) =>
          // 0/0 is NaN for doubles, not NULL — guard the denominator
          aggd.select(lit(n).as("check"),
            when(col("__n") === 0, lit(1.0))
              .otherwise(col(s"__c_$n").cast("double") /
                col("__n").cast("double")).as("metric"))
            .withColumn("passed", col("metric") >= lit(minR))
        } ++ minRows.map { case (n, m) =>
          aggd.select(lit(n).as("check"),
            col("__n").cast("double").as("metric"))
            .withColumn("passed", col("metric") >= lit(m.toDouble))
        }
      }

    val otherVerdicts = checks.collect {
      case Uniqueness(n, cols, minR) =>
        df.agg(count(lit(1)).as("__n"),
            countDistinct(cols.head, cols.tail: _*).as("__d"))
          .select(lit(n).as("check"),
            when(col("__n") === 0, lit(1.0))
              .otherwise(col("__d").cast("double") /
                col("__n").cast("double")).as("metric"))
          .withColumn("passed", col("metric") >= lit(minR))
      case ReferentialIntegrity(n, fk, dim, pk, minR) =>
        val keys = dim.select(col(pk).as("__pk")).distinct()
        val nonNull = df.filter(col(fk).isNotNull)
        val matched = nonNull
          .join(broadcast(keys), col(fk) === col("__pk"), "left_semi")
          .agg(count(lit(1)).as("__m"))
        val total = nonNull.agg(count(lit(1)).as("__t"))
        matched.crossJoin(broadcast(total))
          .select(lit(n).as("check"),
            when(col("__t") === 0, lit(1.0))
              .otherwise(col("__m").cast("double") /
                col("__t").cast("double")).as("metric"))
          .withColumn("passed", col("metric") >= lit(minR))
    }

    (localVerdicts ++ otherVerdicts).reduce(_ unionAll _)
  }
}
