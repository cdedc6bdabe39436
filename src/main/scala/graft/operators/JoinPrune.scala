package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction — the runtime-filter idiom made explicit.
  *
  * A fact⋈dim equi-join at 100 TB shuffles the ENTIRE fact side on the
  * join key, even when the dim side (after its own filters) matches a
  * sliver of it. The classic fix is a semi-join reducer: fold the dim
  * keys into a Bloom filter, broadcast the blob, and drop non-matching
  * fact rows AT THE SCAN, before the shuffle. Spark's AQE injects this
  * itself in narrow cases (`spark.sql.optimizer.runtime.bloomFilter.
  * enabled`, InjectRuntimeFilter), but only under creation-side
  * heuristics it controls; this operator is the same machinery under
  * explicit user control — any dim frame, any key, chosen sizing.
  *
  * Correctness contract (what makes this oracle-able as an EXACT
  * query, not an approximation): a Bloom filter has no false
  * negatives, so [[bloomPrune]] keeps a SUPERSET of the fact rows that
  * can match, and the exact join that follows removes the ~fpp false
  * positives. `bloomPrune(fact) ⋈ dim ≡ fact ⋈ dim`, row for row —
  * the filter changes the plan's shuffle volume, never its answer.
  * NULL fact keys prune immediately (`might_contain(NULL)` is NULL ⇒
  * filtered), which matches inner-join semantics exactly: NULL never
  * equals anything.
  *
  * Scale shape: the blob is built by Spark's map-side-combining
  * `bloom_filter_agg` (each dim partition ships one `numBits`-sized
  * partial), embedded as a literal, and probed by the codegen'd
  * `might_contain` inside the fact scan stage — fact rows that fail
  * never reach the exchange. Sizing contract (enforced loudly in
  * [[Dedup.bloomMightContain]]): `expectedItems` ≥ the dim's distinct
  * keys, 8 bits/item ≈ 2% fpp, 16 ≈ 0.05%.
  *
  * Reference scope: the flink-ecommerce reference (DataStreamJob.java,
  * 485 lines) joins nothing at this scale; this is extension surface
  * for the TPC-H-shaped analytics the mandate adds.
  */
object JoinPrune {

  /** The pruned FACT frame: every row whose `factKeyCol` might be in
    * `dim.dimKeyCol` (superset of the true matches, short only of
    * NULL-keyed rows, which cannot inner-join anyway). Compose the
    * exact join on top — see [[bloomPrunedJoin]]. */
  def bloomPrune(fact: DataFrame, factKeyCol: String,
      dim: DataFrame, dimKeyCol: String,
      expectedItems: Long, bitsPerItem: Int = 8): DataFrame = {
    val might = Dedup.bloomMightContain(fact, factKeyCol, dim, dimKeyCol,
      expectedItems, bitsPerItem)
    fact.filter(might)
  }

  /** Bloom-pruned exact inner equi-join: ≡ `fact ⋈ dim` with the fact
    * shuffle cut to (matching rows + fpp) before the exchange. The dim
    * frame is evaluated twice (once folded into the blob, once joined);
    * cache or [[graft.Reuse]] it when it is itself expensive. */
  def bloomPrunedJoin(fact: DataFrame, factKeyCol: String,
      dim: DataFrame, dimKeyCol: String,
      expectedItems: Long, bitsPerItem: Int = 8): DataFrame = {
    val pruned = bloomPrune(fact, factKeyCol, dim, dimKeyCol,
      expectedItems, bitsPerItem)
    pruned.join(dim, pruned(factKeyCol) === dim(dimKeyCol))
  }
}
