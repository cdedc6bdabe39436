package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches (Flajolet et al. 2007) — the
  * register-based counterpart to [[Kmv]]'s order-statistics sketch,
  * completing the sketch family: KMV = bottom-k order statistics
  * (exact below k, supports theta set algebra), count-min = frequency
  * table, HLL = fixed 2^p-register leading-zero maxima. HLL's edge at
  * 100 TB is its STATE SIZE: 2^p small ints per group regardless of k
  * or cardinality (m = 64 registers ≈ 64 bytes/group vs KMV's k × 8
  * bytes), with RSE ≈ 1.04/√m.
  *
  * Construction is fully RELATIONAL — no typed Aggregator, no UDF:
  *   hash → (bucket = h mod m, rho = leading-zero-rank of h div m)
  *        → groupBy(group, bucket).max(rho)        [register table]
  *        → groupBy(group) scalarization           [estimate]
  * Both aggregations partial-combine map-side, so each input partition
  * contributes ≤ m register rows per group to the shuffle — raw keys
  * never travel — and everything stays inside whole-stage codegen.
  * The register TABLE (bucket, rho) is the sketch: two corpora merge
  * by a full-outer join + greatest over ≤ m-row frames, without
  * re-reading either corpus ([[mergeRegisters]]).
  *
  * Every estimator output is engineered hash-exact cross-engine (the
  * [[Kmv]] discipline):
  *   - hash = the repo-wide portable sha52 (exact in a double,
  *     replayable verbatim in the oracle engine);
  *   - rho via the BINARY-STRING length of h div m — `bin()` is
  *     minimal-length in both Spark and DuckDB, so rho is integer
  *     string arithmetic, no float log2;
  *   - the harmonic-mean denominator is kept as the INTEGER
  *     S = Σ_j 2^(B+1−M_j) (B = 52−p bits of rank space; empty
  *     registers contribute 2^(B+1)). S ≤ 2^53 is exact in BIGINT and
  *     double, so est_raw = α_m·m²·2^(B+1) / S has exactly one
  *     IEEE rounding on each engine — the division — plus the shared
  *     α product, both in a pinned association order.
  *
  * The small-range linear-counting correction (m·ln(m/V)) needs a
  * transcendental `ln` whose last-ulp behaviour is NOT pinned across
  * engines, so [[estimate]] (the production API) applies it but the
  * oracle queries adjudicate (n_zero, s_scaled, est_raw) — the exact
  * integers the correction is a pure function of.
  *
  * Reference scope: the flink-ecommerce job (DataStreamJob.java, 485
  * lines) has no approximate operators; this is training-data-pipeline
  * extension surface ("distinct URLs per shard of a 100 TB crawl").
  */
object Hll {

  /** Registers per sketch = 2^p. p=6 (m=64) is the smallest precision
    * with a published bias constant table entry and keeps the whole
    * per-group state in one cache line. */
  def m(p: Int): Int = 1 << p

  /** Bits of rank space left after the bucket index: B = 52 − p
    * (sha52 is a 52-bit hash). Max rho = B + 1 (h div m == 0). */
  def rankBits(p: Int): Int = 52 - p

  /** α_m bias constants from Flajolet et al. 2007, §4. */
  def alpha(p: Int): Double = {
    val mm = m(p)
    p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / mm)
    }
  }

  private def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")

  /** Sparse register table per STRING group: (group, bucket, rho) with
    * rho = max over the group's values of (B+1 − bitlength(h div m)),
    * i.e. the 1-based position of the leftmost 1-bit of the rank field
    * (B+1 when the field is all zeros). Absent buckets mean register
    * value 0. Null group keys / values are dropped (no distinct
    * evidence — the [[Kmv.sketch]] contract). */
  def registers(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    requireP(p)
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        bucketCol(col(valueCol), p).as("bucket"),
        rhoCol(col(valueCol), p).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("rho"))
      .withColumnRenamed("g", groupCol)
  }

  /** Scan-side register bucket of one value: h mod m. Shared by the
    * batch [[registers]] and the windowed streaming form
    * ([[graft.streaming.Windows.windowedDistinctRegisters]]). */
  def bucketCol(value: Column, p: Int): Column = {
    requireP(p)
    (Kmv.sha52(value.cast("string")) % m(p)).cast("int")
  }

  /** Scan-side rho of one value: 1-based leftmost-1-bit position of
    * the rank field (B+1 when all zeros). */
  def rhoCol(value: Column, p: Int): Column = {
    requireP(p)
    val b1 = rankBits(p) + 1
    // h div m ≡ h >> p for the non-negative 52-bit sha52 hash
    val rank = shiftright(Kmv.sha52(value.cast("string")), p)
    when(rank === 0, lit(b1))
      .otherwise(lit(b1) - length(bin(rank)))
      .cast("int")
  }

  /** Merge two register tables of the SAME precision: elementwise max,
    * via a full-outer join on (group, bucket) over frames of ≤ m rows
    * per group — the sketches merge, the corpora never co-shuffle.
    * This is the HLL union: registers(A ∪ B) ≡ merge(registers(A),
    * registers(B)) exactly (max is associative/commutative/idempotent),
    * which [[graft.HllSpec]] pins as a property. */
  def mergeRegisters(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.withColumnRenamed("rho", "rho_a")
      .join(b.withColumnRenamed("rho", "rho_b"),
        Seq(groupCol, "bucket"), "full_outer")
      .select(col(groupCol), col("bucket"),
        greatest(coalesce(col("rho_a"), lit(0)),
          coalesce(col("rho_b"), lit(0))).as("rho"))

  /** Scalarize a register table to the oracle-exact estimator inputs:
    * (group, n_zero, s_scaled, est_raw) with
    *   n_zero   = # empty registers (linear-counting input),
    *   s_scaled = Σ_j 2^(B+1−M_j) as BIGINT (≤ 2^53, exact),
    *   est_raw  = α_m·m²·2^(B+1) / s_scaled — the uncorrected HLL
    *              estimate, one IEEE division past two exact factors.
    */
  def scalarize(regs: DataFrame, groupCol: String, p: Int): DataFrame = {
    requireP(p)
    val mm = m(p)
    val b1 = rankBits(p) + 1
    // α·(m²·2^(B+1)): m²·2^(B+1) = 2^(p+53), exact in a double; the α
    // product is the one shared rounding, identical in the oracle's
    // CAST(α AS DOUBLE) * CAST(2^(p+53) AS DOUBLE)
    val num = alpha(p) * java.lang.Math.scalb(1.0, p + 53)
    regs.groupBy(groupCol).agg(
        (lit(mm) - count(lit(1))).cast("int").as("n_zero"),
        (sum(expr(s"shiftleft(cast(1 as bigint), $b1 - rho)")) +
          (lit(mm.toLong) - count(lit(1))) * lit(1L << b1)).as("s_scaled"))
      .withColumn("est_raw", lit(num) / col("s_scaled").cast("double"))
  }

  /** Distinct-count estimator inputs per group, end to end. Registered
    * as `q_hll_distinct`; the DuckDB oracle replays bucket/rho/S
    * integer-for-integer. */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame =
    scalarize(registers(df, groupCol, valueCol, p), groupCol, p)

  /** Production estimate column with the standard small-range
    * correction: linear counting m·ln(m/V) when est_raw ≤ 2.5m and
    * V > 0 (Flajolet et al. §4). `ln` is engine-local (not last-ulp
    * pinned cross-engine), so this column is spec-adjudicated
    * ([[graft.HllSpec]] accuracy bounds), not oracle-hashed. */
  def estimate(p: Int)(nZero: Column, estRaw: Column): Column = {
    requireP(p)
    val mm = m(p).toDouble
    when(estRaw <= lit(2.5 * mm) && nZero > 0,
      lit(mm) * log(lit(mm) / nZero.cast("double")))
      .otherwise(estRaw)
  }
}
