package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic bounded-state uniform row samples — hash-rank
  * (bottom-k by a portable hash of the row's unique id) — and the
  * quantile estimates a telemetry pipeline builds on them.
  *
  * Quantiles at 100 TB have three standard shapes: exact `percentile`
  * (buffers every row per group — doesn't scale), Greenwald–Khanna
  * `approx_percentile` (bounded state, but its summary depends on
  * merge order, so results are NOT deterministic across runs or
  * engines), and quantiles-over-a-sample. This module is the third
  * shape with the [[Kmv]] trick making it fully deterministic: the
  * "random" sample is the k smallest sha52 hashes of the row ids, a
  * set that is a pure function of the DATA — independent of partition
  * count, merge order, or seed plumbing — so the whole construction
  * replays verbatim in the oracle engine (`ORDER BY hash LIMIT k`) and
  * the estimate is hash-adjudicable, not just tolerance-checked.
  *
  * Scale shape: the bottom-k aggregation is an [[Aggregator]] with a
  * bounded sorted buffer (the [[TopKAggregator]]/[[Kmv]] pattern) —
  * partial-combines map-side, ≤ k (hash, value) pairs per group per
  * partition enter the shuffle, raw rows never travel. Sampling error
  * for the q-quantile from a uniform k-sample is ≈ √(q(1−q)/k) in rank
  * space (Dvoretzky–Kiefer–Wolfowitz); k = 256 puts the median inside
  * ±3 rank points at 95%.
  *
  * Determinism contract: the sample is the bottom-k of the DISTINCT
  * (hash, value) pairs in (hash, value) lexicographic order — ids are
  * unique in sane data so this is plain bottom-k-by-hash, and the
  * (value) tie-break + dedupe make the result well-defined even under
  * duplicated ids or replayed rows.
  *
  * Reference scope: no approximate operators in the 485-line reference
  * job (DataStreamJob.java); training-data-pipeline extension surface
  * ("p99 document length per language over the whole crawl, cheap").
  */
object HashSample {

  type HV = (Long, Double) // (sha52(id), value)

  /** Buffer = up-to-k DISTINCT (hash, value) pairs, sorted ascending
    * lexicographically. */
  final case class SampleBuffer(entries: Seq[HV])

  private def less(a: HV, b: HV): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(entries: Seq[HV], e: HV, k: Int): Seq[HV] = {
    if (entries.size >= k && less(entries.last, e)) entries
    else if (entries.contains(e)) entries // distinct pairs only
    else {
      val (front, back) = entries.span(less(_, e))
      (front ++ (e +: back)).take(k)
    }
  }

  /** Bottom-k distinct (hash, value) pairs — the deterministic uniform
    * sample, mergeable with bounded state. */
  def bottomK(k: Int): Aggregator[HV, SampleBuffer, Seq[HV]] = {
    require(k >= 1, s"need k >= 1, got $k")
    new Aggregator[HV, SampleBuffer, Seq[HV]] {
      override def zero: SampleBuffer = SampleBuffer(Vector.empty)
      override def reduce(b: SampleBuffer, e: HV): SampleBuffer =
        SampleBuffer(insert(b.entries, e, k))
      override def merge(a: SampleBuffer, b: SampleBuffer): SampleBuffer =
        SampleBuffer(b.entries.foldLeft(a.entries)((acc, e) => insert(acc, e, k)))
      override def finish(r: SampleBuffer): Seq[HV] = r.entries
      override def bufferEncoder: Encoder[SampleBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[HV]] = ExpressionEncoder()
    }
  }

  /** Per-group deterministic k-sample: (group, hash, value) rows, the
    * bottom-k by (sha52(idCol), value) per group. Null group keys, ids,
    * or values are dropped (no evidence; NULL quantile inputs are
    * meaningless). */
  def sample(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        Kmv.sha52(col(idCol).cast("string")).as("h"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(bottomK(k).toColumn.name("entries"))
      .toDF(groupCol, "entries")
      .select(col(groupCol), explode(col("entries")).as("e"))
      .select(col(groupCol), col("e._1").as("hash"), col("e._2").as("value"))
  }

  /** Sampled quantile estimates per group, exact-interpolation
    * `percentile` over the deterministic sample (≡ DuckDB
    * `quantile_cont` — the q_corpus_stats parity): (group, n_sample,
    * then one `p<percent>_sample` column per requested quantile).
    * Registered as `q_sample_quantiles` with the exact full-data
    * quantiles alongside — the oracle adjudicates BOTH, so the
    * estimate's construction and its target are each pinned. */
  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val cols = qs.map { q =>
      percentile(col("value"), lit(q)).as(nameFor(q))
    }
    sample(df, groupCol, idCol, valueCol, k)
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("int").as("n_sample"), cols: _*)
  }

  /** p0.5 → "p50_sample"; keeps names SQL-identifier-safe for the
    * oracle compare. */
  def nameFor(q: Double): String = {
    val pct = (q * 100).round.toInt
    require(math.abs(q * 100 - pct) < 1e-9,
      s"quantile $q does not name cleanly; use whole percents")
    s"p${pct}_sample"
  }
}
