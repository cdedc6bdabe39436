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
