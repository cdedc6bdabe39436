package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — bounded-size
  * frequency summaries with a one-sided error guarantee: the point
  * estimate min_j CM[j][h_j(x)] is ALWAYS ≥ the true count, and exceeds
  * it by more than ε·N with probability ≤ δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Scale shape: the build is ONE map-side-combinable aggregation —
  * each occurrence contributes d (row, bucket) increments, partial
  * HashAggregate combines within partitions, and the shuffled table is
  * ≤ d·w rows BY CONSTRUCTION no matter the corpus size. Point lookups
  * then broadcast the d·w table and touch each query item once (the
  * DSIR bounded-model-table shape). Contrast the exact alternative: a
  * full groupBy over every distinct item shuffles the whole key
  * universe.
  *
  * Hashes are the repo's portable sha52 of `"j:" || value` (row index
  * prefixed, so the d rows are independent), reproducible verbatim in
  * DuckDB — the sketch TABLE, not just the estimates, is oracle-able.
  *
  * Reference scope: no approximate operators in the 485-line reference
  * job; this is training-data-pipeline extension surface (frequency
  * caps, stop-list mining, per-key rate estimation at 100 TB).
  */
object CountMin {

  private def bucket(row: Int, value: Column, w: Int): Column =
    conv(substring(sha2(concat(lit(s"$row:"), value), 256), 1, 13), 16, 10)
      .cast("long") % w

  /** Build the d×w sketch table: (cm_row int, cm_bucket long, cnt long).
    * Null values are dropped (they carry no frequency evidence). Only
    * touched cells appear — absent (row, bucket) pairs are zero. */
  def table(df: DataFrame, valueCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16, got $d")
    require(w >= 2, s"need w >= 2, got $w")
    val v = col(valueCol).cast("string")
    df.filter(col(valueCol).isNotNull)
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("cm_row"), bucket(j, v, w).as("cm_bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.cm_row").as("cm_row"),
        col("cell.cm_bucket").as("cm_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join cardinality estimate from two count-min sketches built
    * with the SAME (d, w): |A ⋈ B| on the sketched key = Σ_k a_k·b_k,
    * and for each row j, Σ_b CM_A[j][b]·CM_B[j][b] ≥ that inner product
    * (collisions only ADD mass), so the min over rows is a one-sided
    * upper bound — the AMS/CM inner-product estimate (Cormode &
    * Muthukrishnan §4.2). The planner question "how big is this join"
    * answered from two d·w-cell summaries without touching either
    * table again: (cm_row, est_inner) pairs reduce to ONE row.
    * Integer arithmetic end-to-end — oracle-able exactly. */
  def innerProductEstimate(cmA: DataFrame, cmB: DataFrame): DataFrame =
    // LEFT join from A's cells: a row of A with NO cells in common with
    // B must contribute row_est = 0 (the true inner product is 0), not
    // vanish from the min — an inner join would return NULL for fully
    // disjoint corpora instead of the exact 0. Non-matching cells add
    // 0 to the sum either way, so overlap-bearing rows are unchanged.
    cmA.join(cmB.withColumnRenamed("cnt", "cnt_b"),
        Seq("cm_row", "cm_bucket"), "left")
      .groupBy("cm_row")
      .agg(sum(col("cnt") * coalesce(col("cnt_b"), lit(0L))).as("row_est"))
      .agg(min(col("row_est")).as("est_join_size"))

  /** Point estimates for each DISTINCT value of `items(valueCol)`:
    * (value, est_count) with est_count = min over the d rows of the
    * addressed cells — ≥ the true occurrence count, always. The sketch
    * table broadcasts (≤ d·w rows); items are deduped first so the
    * join fan-in is the query universe, not its multiplicity. */
  def pointEstimates(items: DataFrame, sketch: DataFrame, valueCol: String,
      d: Int, w: Int): DataFrame = {
    val v = col(valueCol).cast("string")
    val probes = items.filter(col(valueCol).isNotNull)
      .select(v.as("value")).distinct()
      .select(col("value"), explode(array((0 until d).map(j =>
        struct(lit(j).as("cm_row"),
          bucket(j, col("value"), w).as("cm_bucket"))): _*)).as("cell"))
      .select(col("value"), col("cell.cm_row").as("cm_row"),
        col("cell.cm_bucket").as("cm_bucket"))
    probes
      .join(broadcast(sketch), Seq("cm_row", "cm_bucket"), "left")
      .groupBy("value")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
