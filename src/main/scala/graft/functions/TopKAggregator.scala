package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, posexplode}

/** Typed `Aggregator` for exact per-group top-k by score: keeps a
  * bounded (score, id) buffer per group with partial merges.
  *
  * Why an Aggregator instead of the `row_number() OVER (PARTITION BY
  * group ORDER BY score)` window: the window shuffles and sorts EVERY
  * row of every group to discard all but k of them, while an aggregate
  * combines map-side — each input partition contributes at most k rows
  * per group to the shuffle. For top-3-per-user over a 100 TB event
  * stream, that is the difference between shuffling the stream and
  * shuffling ≈ k × users × partitions rows. This is exactly the
  * "custom `Aggregator` only where perf demands" case from the design
  * rules (SURVEY.md §7) — the window variant stays the oracle-checked
  * reference.
  *
  * Determinism: ties on score break by smaller id, matching the window
  * reference implementation `orderBy(score.desc, id.asc)`.
  */
object TopKAggregator {

  type ScoredId = (Double, Long) // (score, id)

  /** Buffer = up-to-k entries, kept sorted desc by (score, -id). Small k
    * ⇒ insertion into a sorted array beats a heap (no boxing, cache-
    * friendly, cheap merges). */
  final case class TopKBuffer(entries: Seq[ScoredId])

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(entries: Seq[ScoredId], e: ScoredId, k: Int): Seq[ScoredId] = {
    if (entries.size >= k && better(entries.last, e)) entries
    else {
      val (front, back) = entries.span(better(_, e))
      (front ++ (e +: back)).take(k)
    }
  }

  def topK(k: Int): Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] = {
    require(k >= 1)
    new Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] {
      override def zero: TopKBuffer = TopKBuffer(Vector.empty)

      override def reduce(b: TopKBuffer, a: ScoredId): TopKBuffer =
        TopKBuffer(insert(b.entries, a, k))

      override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer =
        TopKBuffer(b2.entries.foldLeft(b1.entries)((acc, e) => insert(acc, e, k)))

      override def finish(r: TopKBuffer): Seq[ScoredId] = r.entries

      override def bufferEncoder: Encoder[TopKBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    }
  }

  type ScoredTerm = (Double, String) // (score, term)

  /** Buffer for the string-payload variant — same bounded sorted-array
    * shape as [[TopKBuffer]]. */
  final case class TopKTermBuffer(entries: Seq[ScoredTerm])

  /** Tie-break for string payloads compares UTF-8 BYTES, not Java
    * `String.compareTo` (UTF-16 code units): Spark's own UTF8String
    * ordering and DuckDB's VARCHAR ordering are both binary byte-wise,
    * and the two diverge from UTF-16 ordering for supplementary-plane
    * text — byte comparison keeps the aggregator's tie-break identical
    * to the `ORDER BY score DESC, term ASC` oracle in every engine. */
  private def utf8Less(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val cmp = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (cmp != 0) return cmp < 0
      i += 1
    }
    ab.length < bb.length
  }

  private def betterTerm(a: ScoredTerm, b: ScoredTerm): Boolean =
    a._1 > b._1 || (a._1 == b._1 && utf8Less(a._2, b._2))

  private def insertTerm(entries: Seq[ScoredTerm], e: ScoredTerm, k: Int): Seq[ScoredTerm] = {
    if (entries.size >= k && betterTerm(entries.last, e)) entries
    else {
      val (front, back) = entries.span(betterTerm(_, e))
      (front ++ (e +: back)).take(k)
    }
  }

  /** String-payload twin of [[topK]] — the second Aggregator
    * instantiation the composite-key review item anticipated: the
    * payload kept per group is a term, not a long id (tf-idf keyword
    * extraction, label top-k). Same bounded-buffer merge shape. */
  def topKTerms(k: Int): Aggregator[ScoredTerm, TopKTermBuffer, Seq[ScoredTerm]] = {
    require(k >= 1)
    new Aggregator[ScoredTerm, TopKTermBuffer, Seq[ScoredTerm]] {
      override def zero: TopKTermBuffer = TopKTermBuffer(Vector.empty)

      override def reduce(b: TopKTermBuffer, a: ScoredTerm): TopKTermBuffer =
        TopKTermBuffer(insertTerm(b.entries, a, k))

      override def merge(b1: TopKTermBuffer, b2: TopKTermBuffer): TopKTermBuffer =
        TopKTermBuffer(b2.entries.foldLeft(b1.entries)((acc, e) => insertTerm(acc, e, k)))

      override def finish(r: TopKTermBuffer): Seq[ScoredTerm] = r.entries

      override def bufferEncoder: Encoder[TopKTermBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredTerm]] = ExpressionEncoder()
    }
  }

  /** Per-group top-k over (key, score, term) rows — the string-payload
    * epilogue. Output columns: (key, rank int 1-based, score, term),
    * ties on score broken by byte-wise-smaller term, identical to the
    * `row_number() OVER (ORDER BY score DESC, term)` window reference. */
  def topKTermsPerGroup[K](ds: Dataset[(K, Double, String)], k: Int)(
      implicit ke: Encoder[K]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topKTerms(k).toColumn.name("topk"))
      .toDF("key", "topk")
      .select(col("key"), posexplode(col("topk")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("score"), col("col._2").as("term"))
  }

  /** [[insert]] with per-id dedupe: the same (score, id) entry arriving
    * from several input partitions (NN-Descent candidate pairs carry
    * one copy per witnessing node) must occupy ONE buffer slot, or
    * duplicates would crowd real neighbors out of the k window. If the
    * id is already buffered with an equal-or-better score the arrival
    * is dropped; a better arrival replaces it (general contract — the
    * descent use case only ever re-sends equal scores). Linear scans
    * are fine at the k this serves. */
  private def insertDistinct(entries: Seq[ScoredId], e: ScoredId,
      k: Int): Seq[ScoredId] = {
    val at = entries.indexWhere(_._2 == e._2)
    if (at < 0) insert(entries, e, k)
    else if (!better(e, entries(at))) entries
    else insert(entries.patch(at, Nil, 1), e, k)
  }

  /** Id-deduplicating twin of [[topK]] — exact top-k over DISTINCT ids
    * per group, same bounded map-side-combining shape. */
  def topKDistinct(k: Int): Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] = {
    require(k >= 1)
    new Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] {
      override def zero: TopKBuffer = TopKBuffer(Vector.empty)

      override def reduce(b: TopKBuffer, a: ScoredId): TopKBuffer =
        TopKBuffer(insertDistinct(b.entries, a, k))

      override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer =
        TopKBuffer(b2.entries.foldLeft(b1.entries)(
          (acc, e) => insertDistinct(acc, e, k)))

      override def finish(r: TopKBuffer): Seq[ScoredId] = r.entries

      override def bufferEncoder: Encoder[TopKBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    }
  }

  /** [[topKPerGroup]] with the dedupe-aware buffer: duplicate
    * (key, id) rows — however many, from whatever partitions — cost
    * ONE slot and never a pre-aggregation distinct/group-by shuffle.
    * Output: (key, rank, score, id). */
  def topKDistinctPerGroup[K](ds: Dataset[(K, Double, Long)], k: Int)(
      implicit ke: Encoder[K]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topKDistinct(k).toColumn.name("topk"))
      .toDF("key", "topk")
      .select(col("key"), posexplode(col("topk")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("score"), col("col._2").as("id"))
  }

  /** The per-group top-k lists as ONE ARRAY row per key — for consumers
    * that need the whole list per key (NN-Descent's B sets): skipping
    * the posexplode + re-collect round trip saves a full shuffle per
    * use. Output: (key, topk array<struct<_1 score, _2 id>>). */
  def topKDistinctArrays[K](ds: Dataset[(K, Double, Long)], k: Int)(
      implicit ke: Encoder[K]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topKDistinct(k).toColumn.name("topk"))
      .toDF("key", "topk")
  }

  /** Shared top-k-per-group epilogue over (key, score, id) rows —
    * THE scale-safe replacement for `row_number() OVER (PARTITION BY
    * key ORDER BY score DESC, id)` + `rank <= k`: each input partition
    * contributes at most k rows per key to the shuffle instead of
    * every row of every key landing in one window partition. Used by
    * the similarity top-k family, the per-group-quota sampler, and the
    * top-orders query. Output columns: (key, rank int 1-based, score,
    * id), ties on score broken by smaller id — identical to the window
    * formulation, which stays as the oracle/spec reference. */
  def topKPerGroup[K](ds: Dataset[(K, Double, Long)], k: Int)(
      implicit ke: Encoder[K]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topK(k).toColumn.name("topk"))
      .toDF("key", "topk")
      .select(col("key"), posexplode(col("topk")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("score"), col("col._2").as("id"))
  }
}
