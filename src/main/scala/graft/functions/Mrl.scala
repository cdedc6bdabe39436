package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable bounded-memory quantile sketch in the Munro–Paterson /
  * Manku–Rajagopalan–Lindsay (MRL) collapsing-buffer family — the
  * quantile member of the sketch surface next to HLL (distinct), KMV
  * (set algebra), count-min (frequency) and Misra–Gries (heavy
  * hitters).
  *
  * Structure: a binary-counter ladder of sorted buffers. Slot i holds
  * at most one sorted buffer of ≤ k values, each value standing for
  * 2^i original elements. New values accumulate in an unsorted weight-1
  * buffer; when it reaches k it is sorted and carried into the ladder,
  * and a carry that lands on an occupied slot COLLAPSES: the two
  * buffers merge (2k sorted values) and the elements at even 1-based
  * positions survive at doubled weight. Keeping position 2j preserves
  * that element's cumulative-rank estimate (2j·w before, j·2w after),
  * so a collapse adds nothing to the error of kept elements — it only
  * coarsens selection by the dropped neighbors, ≤ w ranks per collapse.
  * The sketch tracks that sum (`err`), so every answer ships with its
  * own certified bound: the true rank of a returned value is within
  * `err + maxWeight` of the requested rank. With no collapse (total
  * n ≤ k under ANY partitioning — the accumulation buffer only
  * promotes at exactly k) the sketch IS the sorted data and answers
  * are exact; that regime is what the DuckDB oracle adjudicates, the
  * bounded-error regime is property-spec'd (including sorted input,
  * MRL's worst case).
  *
  * Scale: state per group is O(k·log(n/k)) doubles and merges
  * map-side, so a partition contributes ≤ that per group to the
  * shuffle no matter how many rows it scanned — the bounded-state
  * shape `percentile_approx` shares, but deterministic given the
  * merge tree, with an explicit carried bound instead of an opaque
  * accuracy parameter.
  *
  * Reference scope: flink-ecommerce computes no quantiles (485-line
  * exact pipeline); this is training-data-pipeline surface ("p95
  * document length over 100 TB" is a sketch question).
  */
object Mrl {

  /** `acc` = unsorted weight-1 intake (< k values); `slots(i)` =
    * sorted buffer of weight 2^(i+1 … ) — index i carries weight 2^i —
    * empty Seq = vacant; `n` = total count; `err` = Σ collapse
    * weights, the certified selection-error budget. */
  final case class MrlBuffer(acc: Seq[Double], slots: Seq[Seq[Double]],
      n: Long, err: Long)

  final case class MrlResult(n: Long, err_bound: Long, values: Seq[Double])

  private def mergeSorted(a: Seq[Double], b: Seq[Double]): Array[Double] = {
    val out = new Array[Double](a.size + b.size)
    var i = 0; var j = 0; var o = 0
    while (i < a.size && j < b.size) {
      if (a(i) <= b(j)) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    while (i < a.size) { out(o) = a(i); i += 1; o += 1 }
    while (j < b.size) { out(o) = b(j); j += 1; o += 1 }
    out
  }

  /** Carry a sorted weight-2^`level` buffer into the ladder,
    * collapsing up the slots binary-counter style. */
  private def carry(slots: Seq[Seq[Double]], buf: Seq[Double], level: Int,
      err: Long): (Seq[Seq[Double]], Long) = {
    var s = slots.toVector
    var cur = buf
    var lvl = level
    var e = err
    while (lvl < s.size && s(lvl).nonEmpty) {
      val merged = mergeSorted(s(lvl), cur)
      // even 1-based positions survive at doubled weight; dropped
      // neighbors cost ≤ one buffer-weight of selection error
      val kept = Array.tabulate(merged.length / 2)(j => merged(2 * j + 1))
      e += (1L << lvl)
      s = s.updated(lvl, Vector.empty)
      cur = kept.toVector
      lvl += 1
    }
    while (s.size <= lvl) s = s :+ Vector.empty
    (s.updated(lvl, cur), e)
  }

  /** Promote the intake buffer (sort, carry at weight 1) iff full. */
  private def spill(b: MrlBuffer, k: Int): MrlBuffer =
    if (b.acc.size < k) b
    else {
      val (slots, err) = carry(b.slots, b.acc.sorted, 0, b.err)
      MrlBuffer(Vector.empty, slots, b.n, err)
    }

  def quantilesAgg(k: Int, qs: Seq[Double])
      : Aggregator[Double, MrlBuffer, MrlResult] = {
    require(k >= 2 && (k % 2 == 0), s"need even k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs $qs")
    new Aggregator[Double, MrlBuffer, MrlResult] {
      override def zero: MrlBuffer = MrlBuffer(Vector.empty, Vector.empty, 0L, 0L)
      override def reduce(b: MrlBuffer, v: Double): MrlBuffer =
        spill(MrlBuffer(b.acc :+ v, b.slots, b.n + 1, b.err), k)
      override def merge(a: MrlBuffer, b: MrlBuffer): MrlBuffer = {
        // intake union may exceed k: promote a full k (sorted prefix —
        // any k weight-1 values may promote, no error) and keep the rest
        val acc = a.acc ++ b.acc
        val (acc2, slots0, err0) =
          if (acc.size >= k) {
            val sorted = acc.sorted
            val (s, e) = carry(a.slots, sorted.take(k), 0, a.err + b.err)
            (sorted.drop(k), s, e)
          } else (acc, a.slots, a.err + b.err)
        var slots = slots0
        var err = err0
        for (lvl <- b.slots.indices if b.slots(lvl).nonEmpty) {
          val (s, e) = carry(slots, b.slots(lvl), lvl, err)
          slots = s; err = e
        }
        spill(MrlBuffer(acc2, slots, a.n + b.n, err), k)
      }
      override def finish(r: MrlBuffer): MrlResult = {
        if (r.n == 0L) return MrlResult(0L, 0L, qs.map(_ => Double.NaN))
        // weighted values, sorted; cumulative-weight select per q
        val weighted =
          (r.acc.map(v => (v, 1L)) ++
            r.slots.zipWithIndex.flatMap { case (buf, lvl) =>
              buf.map(v => (v, 1L << lvl))
            }).sortBy(_._1)
        val maxW = weighted.iterator.map(_._2).max
        val values = qs.map { q =>
          val target = math.max(1L, math.ceil(q * r.n.toDouble).toLong)
          var cum = 0L
          var picked = weighted.last._1
          val it = weighted.iterator
          var done = false
          while (!done && it.hasNext) {
            val (v, w) = it.next()
            cum += w
            if (cum >= target) { picked = v; done = true }
          }
          picked
        }
        MrlResult(r.n, r.err + maxW, values)
      }
      override def bufferEncoder: Encoder[MrlBuffer] = ExpressionEncoder()
      override def outputEncoder: Encoder[MrlResult] = ExpressionEncoder()
    }
  }

  /** Per-group quantiles over a long-keyed group column:
    * (group, n, err_bound, values array aligned with `qs`). Null group
    * keys and null/NaN values are dropped — a NaN would sort to the
    * top of every buffer and poison the upper quantiles. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(col(groupCol).cast("long").as("g"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(quantilesAgg(k, qs).toColumn.name("r"))
      .toDF(groupCol, "r")
      .select(col(groupCol), col("r.n").as("n"),
        col("r.err_bound").as("err_bound"), col("r.values").as("values"))
  }
}
