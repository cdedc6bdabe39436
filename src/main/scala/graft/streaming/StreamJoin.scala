package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution topology
  * (impressions ⋈ clicks) the unwindowed reference job never needs but
  * any event pipeline at scale does.
  *
  * Why the watermarks and the time-bound are REQUIRED, not optional: a
  * stream-stream inner join must buffer both sides' state until no
  * matching row can still arrive. The interval condition
  * `click_ts ∈ [imp_ts, imp_ts + window]` plus both watermarks lets
  * Spark evict an impression once the click watermark passes
  * `imp_ts + window` (and vice versa), so state is
  * ≈ rate × (window + lateness) rows per side regardless of stream
  * length. Without the time-bound Spark would buffer BOTH STREAMS
  * FOREVER — the unbounded-state failure mode, at 100 TB a guaranteed
  * OOM.
  */
object StreamJoin {

  /** Inner-join clicks to the impression of the same `keyCol` that
    * happened at most `windowSeconds` earlier. Both inputs must carry
    * event-time columns `impTsCol`/`clickTsCol`; output one row per
    * (impression, qualifying click).
    * Works identically on batch frames (watermark is a no-op there),
    * which is how the spec cross-checks the join predicate. */
  def clicksAfterImpressions(impressions: DataFrame, clicks: DataFrame,
      keyCol: String, impTsCol: String, clickTsCol: String,
      windowSeconds: Long, lateness: String = "10 seconds"): DataFrame = {
    require(windowSeconds > 0, s"need a positive join window, got $windowSeconds")
    val imp = impressions.withWatermark(impTsCol, lateness)
    val clk = clicks.withWatermark(clickTsCol, lateness)
    // equi-key plus interval bound: the equi part hash-partitions both
    // sides (one shuffle each), the interval part bounds state lifetime
    imp.join(clk,
      imp(keyCol) === clk(keyCol) &&
        clk(clickTsCol) >= imp(impTsCol) &&
        clk(clickTsCol) <= imp(impTsCol) + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(imp(keyCol).as("key"),
        imp(impTsCol).as("imp_ts"),
        clk(clickTsCol).as("click_ts"),
        (unix_micros(clk(clickTsCol)) - unix_micros(imp(impTsCol)))
          .as("lag_us"))
  }

  /** LEFT-OUTER form of [[clicksAfterImpressions]] — the attribution
    * query a funnel report actually needs: every impression emits,
    * matched ones with their click(s), UNMATCHED ones exactly once
    * with a null click. The null row for an impression cannot be
    * emitted when the impression arrives (a qualifying click may still
    * come); Spark holds it in the join state and emits the null-padded
    * row only when the CLICK-side watermark passes
    * `imp_ts + window + lateness` — i.e. null emission is
    * watermark-driven state EVICTION, so outer results trail the data
    * by the bound, and a stalled click stream stalls null emission
    * (the documented outer-join caveat, not a bug). State stays
    * ≈ rate × (window + lateness) per side, same as the inner form.
    *
    * On batch frames the identical predicate emits null rows
    * immediately (no watermark) — how the spec cross-checks the
    * semantics. Output: (key, imp_ts, click_ts [null ⇔ unmatched],
    * lag_us [null ⇔ unmatched]). */
  def clicksAfterImpressionsOuter(impressions: DataFrame, clicks: DataFrame,
      keyCol: String, impTsCol: String, clickTsCol: String,
      windowSeconds: Long, lateness: String = "10 seconds"): DataFrame = {
    require(windowSeconds > 0, s"need a positive join window, got $windowSeconds")
    val imp = impressions.withWatermark(impTsCol, lateness)
    val clk = clicks.withWatermark(clickTsCol, lateness)
    imp.join(clk,
      imp(keyCol) === clk(keyCol) &&
        clk(clickTsCol) >= imp(impTsCol) &&
        clk(clickTsCol) <= imp(impTsCol) + expr(s"INTERVAL $windowSeconds SECONDS"),
      "left_outer")
      .select(imp(keyCol).as("key"),
        imp(impTsCol).as("imp_ts"),
        clk(clickTsCol).as("click_ts"),
        (unix_micros(clk(clickTsCol)) - unix_micros(imp(impTsCol)))
          .as("lag_us"))
  }

  /** Stream-static enrichment: left-join a stream to a BROADCAST
    * dimension table — the most common streaming-ETL shape (events ⋈
    * product/user/geo dim) and stateless by construction: unlike a
    * stream-stream join there is NO watermark and NO state store,
    * because the static side is fully known every micro-batch. Rows
    * with no dim match pass through with nulls (left join — an
    * enrichment must never drop events).
    *
    * Scale: the broadcast means the stream side never shuffles — each
    * micro-batch's tasks probe a local hash map. Keep the dim
    * dim-sized, not fact-sized.
    *
    * SLOWLY-CHANGING DIMS — measured, not assumed: a parquet-backed
    * static side is SNAPSHOT-PINNED at plan time, and an in-place
    * overwrite of the dim directory mid-stream fails the next
    * micro-batch with FILE_NOT_EXIST (probed in this environment; the
    * file index is resolved once). To refresh a dim without restarting
    * the query, do the join inside `foreachBatch` with a fresh
    * `spark.read` per batch, or back the dim with a table format that
    * supports snapshot isolation. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left_outer")

  /** The refresh route the scaladoc above promises, as a first-class
    * helper: a `foreachBatch` body that re-loads the dimension FRESH
    * each micro-batch before enriching, so dim updates (including an
    * in-place parquet overwrite, the case that kills the plan-time
    * snapshot with FILE_NOT_EXIST) are picked up mid-stream without
    * restarting the query.
    *
    * `loadDim` runs on the driver once per micro-batch — keep it a
    * cheap dim-table read (`s.read.parquet(dimPath)`); the per-batch
    * plan still broadcasts it, so the stream side never shuffles.
    * Usage:
    * {{{
    * stream.writeStream.foreachBatch(
    *   StreamJoin.refreshedDimEachBatch(
    *     s => s.read.parquet(dimPath), "product_id") {
    *     (enriched, batchId) => sink(enriched, batchId)
    *   })
    * }}} */
  def refreshedDimEachBatch(
      loadDim: org.apache.spark.sql.SparkSession => DataFrame, keyCol: String)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val dim = loadDim(batch.sparkSession)
      sink(enrichWithDim(batch, dim, keyCol), batchId)
    }
}
