package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution over structured records — the "same real-world
  * customer, two rows" problem (CRM merge, account dedup, catalog
  * reconciliation). The structured-record complement of the text
  * near-dup families: fields are few and typed, so similarity is a
  * WEIGHTED COMBINATION of per-field comparators (Fellegi–Sunter in
  * its deterministic-score form), not a shingle set.
  *
  * Scale shape — blocking, then scoring:
  *  - Candidates come from an EQUALITY self/cross join on `blockCols`
  *    (a plain hash join; no all-pairs anywhere). Candidate volume is
  *    Σ_b |block_b|² — the operator's cost knob is choosing block keys
  *    with bounded frequency, exactly the df-cap role in the shingle
  *    families. Skewed blocks are ordinary join skew (AQE splits
  *    them, or salt upstream).
  *  - Scoring is scan-local per candidate row: `levenshtein` for
  *    string fields (normalized to 1 − d/maxlen, identical in DuckDB),
  *    equality for exact fields. No second shuffle: the threshold
  *    filter runs before anything else sees the pairs.
  *
  * Determinism: score = Σ weight·sim in FIELD-LIST ORDER (both
  * engines left-associate the same chain), `levenshtein` is the
  * standard unit-cost DP in Spark and DuckDB, and null field values
  * contribute 0 — so the whole construction is oracle-replayable.
  */
object RecordLinkage {

  /** One field comparator: `exact = true` scores 1.0 on equality else
    * 0; `exact = false` scores 1 − levenshtein/max(length) (both
    * lengths ≥ 1 guarded). Nulls on either side score 0. */
  final case class FieldSim(name: String, weight: Double,
      exact: Boolean = false)

  private def fieldScore(f: FieldSim, a: Column, b: Column): Column = {
    val sim =
      if (f.exact) when(a === b, 1.0).otherwise(0.0)
      else lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b), lit(1)).cast("double")
    when(a.isNull || b.isNull, 0.0).otherwise(sim * f.weight)
  }

  private def score(fields: Seq[FieldSim], aPfx: String,
      bPfx: String): Column =
    fields.map(f => fieldScore(f, col(s"$aPfx${f.name}"),
        col(s"$bPfx${f.name}")))
      .reduceLeft(_ + _)

  private def side(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[FieldSim], pfx: String, idOut: String): DataFrame = {
    val fieldCols = fields.map(_.name).distinct
    df.select(
      (col(idCol).as(idOut) +:
        blockCols.map(c => col(c).as(s"__bk_$c"))) ++
        fieldCols.map(c => col(c).as(s"$pfx$c")): _*)
  }

  private def validate(fields: Seq[FieldSim], blockCols: Seq[String],
      threshold: Double): Unit = {
    require(fields.nonEmpty && blockCols.nonEmpty)
    require(fields.forall(_.weight > 0), "field weights must be positive")
    require(threshold > 0 && threshold <= fields.map(_.weight).sum,
      s"threshold $threshold outside (0, ${fields.map(_.weight).sum}]")
  }

  /** Within-one-frame duplicate-record pairs: (id_a, id_b, score) with
    * id_a < id_b, score ≥ threshold. Records in different blocks are
    * never compared (that is the point of blocking — a pair split
    * across blocks is a recall miss the block-key choice owns). */
  def dedupePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[FieldSim], threshold: Double): DataFrame = {
    validate(fields, blockCols, threshold)
    val a = side(df, idCol, blockCols, fields, "__a_", "id_a")
    val b = side(df, idCol, blockCols, fields, "__b_", "id_b")
    a.join(b, blockCols.map(c => s"__bk_$c"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", score(fields, "__a_", "__b_"))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** Sorted-neighborhood method (Hernández & Stolfo 1995, public
    * literature) — the OTHER classic candidate scheme next to equality
    * blocking: sort all records by a key, compare only records within
    * `window` positions. Catches near-duplicates whose block keys
    * disagree (typo'd nation, missing segment) as long as the sort key
    * keeps them adjacent; the recall trade is inverted vs blocking, so
    * production ER runs both and unions candidates (both live here).
    *
    * Scale: the global rank is BUCKETED — approxQuantile cuts over an
    * order-preserving numeric coarsening of the sort key's first 7
    * bytes (UTF-8 byte order ≡ codepoint order, so same-prefix rows
    * can never split across buckets out of order), per-bucket
    * row_number over the full (key, id) order, broadcast bucket-count
    * offsets — no single-partition sort anywhere (the
    * [[graft.operators.Scale.globalRank]] construction generalized to
    * string keys). Candidates come from a rank band join: each row
    * lands in rank-bucket ⌊(rank−1)/window⌋, probes its own and the
    * next bucket (any pair within `window` ranks differs by ≤ 1
    * bucket), and the exact 0 < Δrank ≤ window filter runs on the
    * equi-join output — candidate volume ≈ n·window, never n².
    * Scoring and determinism as [[dedupePairs]]; output (id_a, id_b,
    * score) with id_a < id_b. */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortKeyCol: String,
      fields: Seq[FieldSim], threshold: Double, window: Int = 10,
      buckets: Int = 64): DataFrame = {
    validate(fields, Seq(sortKeyCol), threshold)
    require(window >= 1, s"window must be >= 1, got $window")
    val fieldCols = fields.map(_.name).distinct
    val base = df.filter(col(sortKeyCol).isNotNull)
      .select((col(idCol).as("__id") +: col(sortKeyCol).as("__key") +:
        fieldCols.map(c => col(c).as(s"__f_$c"))): _*)
    // order-preserving coarsening: the first 7 characters, big-endian,
    // each CLAMPED to 255. ascii() returns full codepoints, so an
    // unclamped 8-slot packing overflows Long on the first non-ASCII
    // character (é = 201 in slot 0 ⇒ 201·2⁵⁶ > Long.MAX) and corrupts
    // the bucket order exactly on international-name data. Clamping is
    // monotone non-decreasing — a valid coarsening needs nothing more
    // (ties collapse into one bucket, where the full (key, id) sort
    // still orders them) — and 7 × 8 bits tops out at 2⁵⁶ − 1, safely
    // inside Long.
    val key64 = (0 until 7).map(i =>
        least(ascii(substring(col("__key"), i + 1, 1)), lit(255))
          .cast("long") * lit(1L << (8 * (6 - i))))
      .reduceLeft(_ + _)
    val keyed = base.withColumn("__k64", key64)
    val cuts =
      if (buckets == 1) Array.empty[Double]
      else keyed.select(col("__k64").cast("double").as("__v"))
        .stat.approxQuantile("__v",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("__k64").cast("double") > lit(c), 1).otherwise(0)
    }
    val bucketed = keyed.withColumn("__b", bucket)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col("__key"), col("__id"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .select(col("__b"),
        coalesce(sum(col("__n")).over(wOff), lit(0L)).as("__off"))
    val ranked = bucketed
      .withColumn("__rl", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("__rank", col("__off") + col("__rl"))
      .drop("__b", "__rl", "__off", "__k64", "__key")

    // rank band join: a probes its own and the next rank-bucket
    val rbkt = floor((col("__rank") - 1) / lit(window)).cast("long")
    val aSide = ranked.withColumn("__rb0", rbkt)
      .withColumn("__rb", explode(array(col("__rb0"), col("__rb0") + 1)))
      .drop("__rb0")
    val bSide = ranked.withColumn("__rb", rbkt)
    val renamedB = bSide.columns.foldLeft(bSide) { (d, c) =>
      if (c == "__rb") d else d.withColumnRenamed(c, c.replace("__", "__x"))
    }
    aSide.join(renamedB, Seq("__rb"))
      .filter(col("__xrank") > col("__rank") &&
        col("__xrank") <= col("__rank") + window)
      .withColumn("score", score(fields, "__f_", "__xf_"))
      .filter(col("score") >= threshold)
      .select(least(col("__id"), col("__xid")).as("id_a"),
        greatest(col("__id"), col("__xid")).as("id_b"), col("score"))
  }

  /** Cross-frame linkage (the merge-two-systems shape): every LEFT
    * record against same-block RIGHT records; (id_left, id_right,
    * score ≥ threshold). */
  def linkAcross(left: DataFrame, leftIdCol: String, right: DataFrame,
      rightIdCol: String, blockCols: Seq[String], fields: Seq[FieldSim],
      threshold: Double): DataFrame = {
    validate(fields, blockCols, threshold)
    val a = side(left, leftIdCol, blockCols, fields, "__a_", "id_left")
    val b = side(right, rightIdCol, blockCols, fields, "__b_", "id_right")
    a.join(b, blockCols.map(c => s"__bk_$c"))
      .withColumn("score", score(fields, "__a_", "__b_"))
      .filter(col("score") >= threshold)
      .select("id_left", "id_right", "score")
  }
}
