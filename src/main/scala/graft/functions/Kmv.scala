package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV / theta distinct-count sketches — the bounded-memory answer to
  * `count(DISTINCT …)` at corpus scale, and the set-operation algebra
  * (union / intersection / Jaccard) that exact distinct counts cannot
  * give without co-shuffling both corpora.
  *
  * The sketch keeps the k MINIMUM distinct values of a uniform hash of
  * the keys (Bar-Yossef et al. 2002; the Apache DataSketches "theta"
  * family is the same construction). With h_(k) the k-th smallest hash
  * in a space of size M, the estimate (k−1)·M/h_(k) is unbiased with
  * RSE ≈ 1/√(k−2). Two sketches merge by taking the k smallest of the
  * union — associative and commutative, so the aggregation combines
  * map-side: each input partition contributes ≤ k longs per group to
  * the shuffle, NO raw keys travel. That is the 100 TB shape:
  * `count(DISTINCT user_id)` shuffles every distinct key; the sketch
  * shuffles k·groups·partitions longs, a constant per partition.
  *
  * Hash: the repo's portable sha52 — first 13 hex chars of sha256,
  * an integer in [0, 2⁵²) that is exact in a double and reproducible
  * verbatim in DuckDB, so every estimate is hash-comparable cross
  * -engine (collisions, if any, are IDENTICAL on both sides). All
  * estimator arithmetic is engineered to round identically: (k−1)·M is
  * exact in a double (small-int × power-of-two), the one division is
  * correctly rounded in both engines, and additions are written in one
  * fixed association order.
  *
  * Reference scope: the flink-ecommerce job has no approximate
  * operators (485-line exact pipeline, DataStreamJob.java); this is
  * part of the training-data-pipeline extension surface, where
  * "distinct web domains in a 100 TB crawl" is a sketch question.
  */
object Kmv {

  /** Hash space is [0, 2^52): 13 hex nibbles. Exact in a double. */
  val M: Double = 4503599627370496.0 // 2^52

  /** Portable 52-bit hash of a string column (the repo-wide sha52). */
  def sha52(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 13), 16, 10).cast("long")

  /** Buffer = up-to-k DISTINCT hashes kept sorted ascending. Same
    * bounded-sorted-array choice as [[TopKAggregator]]: small k makes
    * binary-search insertion beat a heap, and merges are linear. */
  final case class KmvBuffer(hashes: Seq[Long])

  private def insert(hs: Seq[Long], h: Long, k: Int): Seq[Long] = {
    if (hs.size >= k && h >= hs.last) hs // can't displace anything
    else {
      val idx = {
        var lo = 0; var hi = hs.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (hs(mid) < h) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (idx < hs.size && hs(idx) == h) hs // distinct: already present
      else (hs.take(idx) ++ (h +: hs.drop(idx))).take(k)
    }
  }

  /** k smallest distinct hashes, mergeable with bounded state. */
  def bottomKDistinct(k: Int): Aggregator[Long, KmvBuffer, Seq[Long]] = {
    require(k >= 2, s"need k >= 2 for the KMV estimator, got $k")
    new Aggregator[Long, KmvBuffer, Seq[Long]] {
      override def zero: KmvBuffer = KmvBuffer(Vector.empty)
      override def reduce(b: KmvBuffer, h: Long): KmvBuffer =
        KmvBuffer(insert(b.hashes, h, k))
      override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
        KmvBuffer(b.hashes.foldLeft(a.hashes)((acc, h) => insert(acc, h, k)))
      override def finish(r: KmvBuffer): Seq[Long] = r.hashes
      override def bufferEncoder: Encoder[KmvBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    }
  }

  /** Per-group KMV sketch over STRING group keys: one row per group,
    * `hashes` = the k smallest distinct sha52 values of `valueCol`
    * (stringified — sha52 is byte-typed, so LONG 7 and STRING "7"
    * collide intentionally: the sketch identifies VALUES, and callers
    * pick the column). Null group keys and null values are dropped
    * (no distinct evidence). */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        sha52(col(valueCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(bottomKDistinct(k).toColumn.name("hashes"))
      .toDF(groupCol, "hashes")
  }

  /** Estimate column over a sorted k-min `hashes` array: exact size
    * when the sketch is unsaturated, (k−1)·M/h_(k) when full. The
    * multiplication (k−1)·M is exact (small int × 2⁵²), so the single
    * division is the only rounding — identical in DuckDB. */
  private def estimateCol(hashes: Column, k: Int): Column =
    when(size(hashes) < k, size(hashes).cast("double"))
      .otherwise(lit((k - 1).toDouble * M) /
        element_at(hashes, k).cast("double"))

  /** Distinct-count estimate per group:
    * (group, n_kept int, est_distinct double). Oracle-able: the DuckDB
    * side computes the identical bottom-k over the identical hashes
    * (`q_distinct_kmv`). Below k distinct values the sketch IS the
    * exact answer. */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    sketch(df, groupCol, valueCol, k)
      .select(col(groupCol), size(col("hashes")).as("n_kept"),
        estimateCol(col("hashes"), k).as("est_distinct"))

  /** Theta-sketch set algebra over two corpora of values (one sketch
    * each, same k): distinct estimates for A, B, A∩B, A∪B and a
    * Jaccard estimate, in ONE row.
    *
    * θ_A = h_(k)(A) when A is saturated else M; θ = min(θ_A, θ_B).
    * Every kept hash < its side's θ is a uniform θ/M-rate sample of
    * that side's distinct values, so
    * est_inter = |{h ∈ A∩B : h < θ}| · M/θ (Dasgupta et al., the
    * DataSketches theta intersection), est_union = est_A + est_B −
    * est_inter (inclusion–exclusion, one fixed association order),
    * jaccard_est = est_inter / est_union.
    *
    * Both sketch frames are 1-row; the combine is a broadcast cross
    * join + array expressions — nothing corpus-sized moves. */
  def overlapEstimate(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    def one(df: DataFrame, name: String): DataFrame =
      sketch(df.select(lit("all").as("g"), col(valueCol)), "g", valueCol, k)
        .select(col("hashes").as(name))
    def theta(hs: Column): Column =
      when(size(hs) < k, lit(M)).otherwise(element_at(hs, k).cast("double"))
    val joined = one(a, "ha").crossJoin(one(b, "hb"))
      .withColumn("theta", least(theta(col("ha")), theta(col("hb"))))
    val below = (hs: Column) => filter(hs, h => h.cast("double") < col("theta"))
    joined
      .withColumn("n_inter",
        size(below(array_intersect(col("ha"), col("hb")))))
      .withColumn("est_a", estimateCol(col("ha"), k))
      .withColumn("est_b", estimateCol(col("hb"), k))
      .withColumn("est_inter",
        col("n_inter").cast("double") * lit(M) / col("theta"))
      .withColumn("est_union",
        col("est_a") + col("est_b") - col("est_inter"))
      .select(size(col("ha")).as("n_a_kept"), size(col("hb")).as("n_b_kept"),
        col("n_inter"), col("est_a"), col("est_b"), col("est_inter"),
        col("est_union"),
        (col("est_inter") / col("est_union")).as("jaccard_est"))
  }
}
