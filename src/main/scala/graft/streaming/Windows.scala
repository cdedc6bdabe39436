package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked, windowed variants of the running aggregations — the
  * scalable path the reference never takes.
  *
  * The reference (and `EcommerceStreamJob`) keeps UNWINDOWED running
  * state with no watermark (`DataStreamJob.java:98`): state grows with
  * key cardinality forever. Fine for categories/days/months; fatal for
  * unbounded keys (users, transaction ids) on a 100 TB stream. These
  * variants bound state with event-time watermarks: Spark drops window
  * state once `watermark` passes the window end, so state ≈ keys ×
  * (windowLength + lateness) regardless of stream length.
  */
object Windows {

  /** Tumbling-window sales per category:
    * (window_start, window_end, category, total_sales), append-capable.
    * The streaming analogue of Pipeline B with bounded state. */
  def salesPerCategoryWindowed(tx: DataFrame, tsCol: String, catCol: String,
      amtCol: String, windowLength: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    tx.withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), windowLength).as("w"),
        col(catCol).as("category"))
      .agg(sum(col(amtCol)).as("total_sales"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("category"), col("total_sales"))

  /** Sliding-window revenue (e.g. 1-hour window sliding every 10 min) —
    * the moving-aggregate shape the reference cannot express at all. */
  def slidingRevenue(tx: DataFrame, tsCol: String, amtCol: String,
      windowLength: String = "1 hour", slide: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    tx.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength, slide).as("w"))
      .agg(sum(col(amtCol)).as("total_sales"), count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("total_sales"), col("n_events"))

  /** Session windows: activity grouped into dynamic windows that close
    * after `gap` of inactivity per key — e.g. revenue per customer
    * browsing session. A session's state is dropped once the watermark
    * passes its close, so state stays bounded by concurrent sessions.
    * Streaming queries must use `outputMode("append")` (Spark emits a
    * session only once the watermark closes it; update mode is
    * unsupported for session windows). */
  def sessionRevenue(tx: DataFrame, tsCol: String, keyCol: String,
      amtCol: String, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    tx.withWatermark(tsCol, watermark)
      .groupBy(
        session_window(col(tsCol), gap).as("w"),
        col(keyCol).as("session_key"))
      .agg(sum(col(amtCol)).as("total_sales"), count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("session_key"), col("total_sales"), col("n_events"))

  /** Windowed distinct-count sketch: HLL registers per (event-time
    * window, key) — "distinct users per hour per event type" over an
    * unbounded stream with DOUBLY bounded state: the watermark drops
    * window state once it closes (the [[salesPerCategoryWindowed]]
    * bound) AND each open (window, key) holds at most m = 2^p
    * register counters however many distinct values pass through (the
    * [[graft.functions.Hll]] bound) — an exact windowed
    * count-distinct would instead hold every value id seen in the
    * window. Append mode emits a window's registers exactly once,
    * when the watermark closes it; scalarization/estimation runs
    * downstream on the emitted (closed, immutable) register rows —
    * chaining the second stateful aggregation inside one streaming
    * query is both unsupported and unnecessary. The emitted rows are
    * ≡ [[graft.functions.Hll.registers]] over the window's batch
    * slice (spec-pinned), so merged/scalarized results agree with the
    * batch oracle path. */
  def windowedDistinctRegisters(df: DataFrame, tsCol: String,
      keyCol: String, valueCol: String, p: Int,
      windowLength: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(keyCol).cast("string").as("k"),
        graft.functions.Hll.bucketCol(col(valueCol), p).as("bucket"),
        graft.functions.Hll.rhoCol(col(valueCol), p).as("rho"))
      .groupBy(window(col(tsCol), windowLength).as("w"), col("k"),
        col("bucket"))
      .agg(max("rho").as("rho"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("k").as(keyCol), col("bucket"), col("rho"))

  /** Windowed deterministic row sample: the bottom-k-by-hash sample of
    * [[graft.functions.HashSample]] per (event-time window, key) —
    * "p99 value per key per hour" over an unbounded stream. Doubly
    * bounded state like [[windowedDistinctRegisters]]: the watermark
    * drops a window's state at close, and each open (window, key)
    * holds ≤ k (hash, value) pairs however many rows pass through.
    * The bounded typed Aggregator runs RELATIONALLY via
    * `functions.udaf`, so the event-time `window()` column keeps its
    * metadata and append mode emits each window's sample exactly once
    * on close; quantile interpolation happens downstream on the
    * emitted rows ([[graft.functions.HashSample.sampleQuantiles]]'s
    * epilogue). The emitted sample ≡ the batch sample of the window's
    * slice — hash-rank determinism is a property of the data, not of
    * execution order (spec-pinned). */
  def windowedSampleRows(df: DataFrame, tsCol: String, keyCol: String,
      idCol: String, valueCol: String, k: Int,
      windowLength: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val bottomK = udaf(graft.functions.HashSample.bottomK(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    df.filter(col(keyCol).isNotNull && col(idCol).isNotNull &&
        col(valueCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(keyCol).cast("string").as("k"),
        graft.functions.Kmv.sha52(col(idCol).cast("string")).as("h"),
        col(valueCol).cast("double").as("v"))
      .groupBy(window(col(tsCol), windowLength).as("w"), col("k"))
      .agg(bottomK(col("h"), col("v")).as("entries"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("k").as(keyCol), explode(col("entries")).as("e"))
      .select(col("window_start"), col("window_end"), col(keyCol),
        col("e._1").as("hash"), col("e._2").as("value"))
  }

  /** Windowed trending terms: Misra–Gries heavy hitters per event-time
    * window — "what's trending this hour" over an open vocabulary,
    * with ≤ k counters per open window however many distinct terms
    * stream through (an exact windowed count would hold the window's
    * whole vocabulary). Completes the windowed-sketch trio next to
    * [[windowedDistinctRegisters]] and [[windowedSampleRows]]; same
    * posture: append-mode emits a window's summary once at close,
    * carrying the MG hard bounds (every term with count > N/(k+1)
    * present; weights are lower bounds within N/(k+1)) — the summary
    * itself is merge-order dependent, so the contract is the bound,
    * not a replayable value (the [[graft.functions.HeavyHitters]]
    * contract; for an EXACT windowed answer, recount the emitted
    * candidates against the window's rows downstream, as
    * `exactHeavyHitters` does in batch). */
  def windowedTrendingTerms(df: DataFrame, tsCol: String,
      textCol: String, k: Int, windowLength: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val mg = udaf(graft.functions.HeavyHitters.misraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    df.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.functions.TextAnalysis.tokens(col(textCol)))
          .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(window(col(tsCol), windowLength).as("w"))
      .agg(mg(col("term")).as("mg"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        explode(col("mg")).as(Seq("term", "weight_low")))
  }

  /** Windowed quantile sketch: MRL collapsing-buffer quantiles per
    * (event-time window, key) — "p50/p95 latency per endpoint per
    * hour" over an unbounded stream. Fourth member of the windowed
    * sketch family, same doubly-bounded posture: watermark reclaims a
    * window's state at close, and each open (window, key) holds
    * O(k·log(n/k)) doubles however many rows stream through. The
    * emitted answer carries the sketch's own certified rank-error
    * bound ([[graft.functions.Mrl]]): values are exact whenever a
    * (window, key) saw ≤ k rows, and within err_bound ranks
    * otherwise — merge-order dependent beyond that point, so the
    * contract is the bound, not a replayable value (the
    * [[windowedTrendingTerms]] posture, vs the replayable
    * [[windowedSampleRows]]). */
  def windowedQuantiles(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, k: Int, qs: Seq[Double],
      windowLength: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val mrl = udaf(graft.functions.Mrl.quantilesAgg(k, qs),
      org.apache.spark.sql.Encoders.scalaDouble)
    // same null AND NaN exclusion as the batch path (Mrl.groupQuantiles)
    // — a NaN sorts atop every buffer and poisons the upper quantiles
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .groupBy(window(col(tsCol), windowLength).as("w"), col("k"))
      .agg(mrl(col("v")).as("r"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("k").as(keyCol),
        col("r.n").as("n"), col("r.err_bound").as("err_bound"),
        col("r.values").as("values"))
  }

  /** Windowed data-quality ratios: the row-local half of
    * [[graft.operators.DataQuality]] run per event-time window — the
    * in-flight contract monitor ("did completeness crater this
    * hour?"). One streaming aggregation computes every check's
    * passing count in a single state row per window; the verdict rows
    * are exploded from the aggregate AFTER the stateful operator, so
    * append mode emits each window's full verdict set exactly once at
    * close. Only row-local checks are accepted (uniqueness /
    * referential need a second stateful pass a single streaming query
    * cannot chain).
    * Output: (window_start, window_end, check, metric, passed). */
  def windowedCheckRatios(df: DataFrame, tsCol: String,
      checks: Seq[graft.operators.DataQuality.Check],
      windowLength: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.DataQuality.{Completeness, InRange}
    require(checks.nonEmpty, "windowedCheckRatios needs at least one check")
    val rowLocal = checks.map {
      case Completeness(n, c, r) =>
        (n, r, sum(when(col(c).isNotNull, 1L).otherwise(0L)))
      case InRange(n, c, lo, hi, r) =>
        (n, r, sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)))
      case other => throw new IllegalArgumentException(
        s"windowedCheckRatios supports row-local checks only, got $other")
    }
    val aggd = df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength).as("w"))
      .agg(count(lit(1)).as("__n"),
        rowLocal.map { case (n, _, e) => e.as(s"__c_$n") }: _*)
    val verdicts = array(rowLocal.map { case (n, minR, _) =>
      val metric = col(s"__c_$n").cast("double") / col("__n").cast("double")
      struct(lit(n).as("check"), metric.as("metric"),
        (metric >= lit(minR)).as("passed"))
    }: _*)
    aggd.select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), explode(verdicts).as("v"))
      .select(col("window_start"), col("window_end"),
        col("v.check").as("check"), col("v.metric").as("metric"),
        col("v.passed").as("passed"))
  }

  /** Streaming exact dedup on a key with bounded state: duplicates
    * arriving within the watermark horizon are dropped, state for older
    * keys is reclaimed. The streaming face of `Dedup.exactDedup` —
    * at-least-once Kafka delivery + this = effectively-once ingestion
    * without the JDBC upsert having to absorb every replay. */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupWithinWatermark needs at least one key column")
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }
}
