package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState` — the Structured
  * Streaming analogue of the reference's implicit Flink `ValueState`
  * inside `reduce` (`DataStreamJob.java:133-163`), for the cases the
  * built-in aggregation state store can't express.
  *
  * `latestPerKey` materializes an upsert stream in-flight: for each key
  * it remembers the highest event-time seen and emits a record ONLY
  * when it advances the key's state. Downstream sinks then receive
  * exactly the reference's `ON CONFLICT … DO UPDATE` end-state as a
  * change stream, without the database absorbing stale replays.
  *
  * Scale: state per key is one (long, payload) pair, partitioned by the
  * stream's keyBy shuffle exactly like any keyed aggregation. With
  * `ProcessingTimeTimeout` the state self-expires after `stateTtlMs`
  * of key inactivity, bounding memory on unbounded key spaces (the
  * reference's equivalent state grows forever).
  */
object Stateful {

  final case class Keyed[T](key: String, eventTimeMs: Long, value: T)

  /** Per-key latest-record stream. Input must be pre-mapped to
    * `Keyed(key, eventTimeMs, value)`; output is the raw `value` of
    * each record that advanced its key's latest-seen event time.
    * The operator declares `OutputMode.Update` internally, so the
    * enclosing query must use `outputMode("update")` (append-output
    * queries are rejected by Spark's unsupported-operation checker). */
  def latestPerKey[T: Encoder](ds: Dataset[Keyed[T]],
      stateTtlMs: Long = 0L): Dataset[T] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, T](OutputMode.Update(), timeout) {
        (key: String, records: Iterator[Keyed[T]], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Long.MinValue)
            // fold the batch: keep only records advancing the latest ts;
            // emit the final winner once per key per batch
            var best = seen
            var winner: Option[Keyed[T]] = None
            records.foreach { r =>
              if (r.eventTimeMs > best) { best = r.eventTimeMs; winner = Some(r) }
            }
            if (best > seen) {
              state.update(best)
              if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
              winner.map(_.value).iterator
            } else {
              if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
              Iterator.empty
            }
          }
      }
  }
}
