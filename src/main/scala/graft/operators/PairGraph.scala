package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Reuse.ReuseOps

/** Write-once near-duplicate pair-graph artifact.
  *
  * The components family — cluster labels, star contraction,
  * keep-best-per-cluster, leakage-safe split, drop-near-dups — all
  * consume the SAME pair graph (the round-4 bench showed each of the
  * five registered queries re-deriving it from the raw corpus: five
  * full LSH/minhash derivations per suite, which at 100 TB is five full
  * corpus passes instead of one plus four cheap reads).
  *
  * `of` memoizes the derived pair list per (session, key) and
  * materializes it eagerly via [[graft.Reuse]] (mode-selectable:
  * executor-local checkpoint, reliable checkpoint dir, or DISK_ONLY
  * persist — see that scaladoc for the durability trade), so:
  *  - the derivation executes exactly once per session per corpus;
  *  - every consumer's plan starts from the materialized edge list
  *    (bare id pairs — tiny next to the corpus), not from the
  *    shingle/signature pipeline;
  *  - downstream lineage stays short, which is what the iterative
  *    components operators want anyway.
  *
  * On a real cluster the equivalent artifact is the pair list written
  * to a table once per ingest batch ("derive once, join many"); the
  * session-scoped checkpoint is the single-JVM expression of that
  * contract — `reliable` mode is the long-lived-cluster form, where
  * the edge list must survive executor loss. Keys are caller-chosen and must encode every parameter
  * that changes the graph (corpus dir, n, threshold, banding, …) —
  * [[graft.SparkEntry]] uses `"<kind>:<params>:<dir>"`.
  */
object PairGraph {
  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** Return the memoized pair graph for `key`, deriving and
    * materializing it on first use. Keyed by session identity too, so a
    * frame checkpointed in a dead session is never served to a new one. */
  def of(spark: SparkSession, key: String)(derive: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      s"${System.identityHashCode(spark)}:$key",
      new JFunction[String, DataFrame] {
        override def apply(k: String): DataFrame = derive.materialized
      })

  /** Test hook: forget everything (e.g. between probe corpora). */
  def clear(): Unit = cache.clear()

  /** Number of materialized graphs (observability for specs/bench). */
  def size: Int = cache.size()
}
