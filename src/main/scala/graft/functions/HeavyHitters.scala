package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the bounded-memory answer to "which
  * terms are frequent" when the vocabulary itself doesn't fit anywhere
  * — the 100 TB complement to the exact `TextAnalysis.topTerms`
  * (whose aggregation state is one counter PER DISTINCT TERM; fine for
  * a vocab that fits, fatal for open-ended token streams).
  *
  * State is ≤ k counters per partial aggregate, merged with the
  * Agarwal et al. mergeable-summaries rule (sum counters, then shave
  * the (k+1)-largest count off everything), so the shuffle moves ≤ k
  * (term, weight) pairs per partition — CONSTANT memory and constant
  * shuffle regardless of vocabulary size.
  *
  * Deterministic guarantees (not estimates-on-average — hard bounds,
  * spec'd): for every term t with true count c(t) over N tokens,
  *   c(t) − N/(k+1) ≤ estimate(t) ≤ c(t),
  * and any term with c(t) > N/(k+1) is GUARANTEED present in the
  * summary. Absent terms have c(t) ≤ N/(k+1). */
object HeavyHitters {

  /** ≤ k surviving (term, lower-bound weight) counters. */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] = {
    require(k >= 1)
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(m: Map[String, Long], term: String): Map[String, Long] =
        m.get(term) match {
          case Some(c) => m.updated(term, c + 1)
          case None if m.size < k => m.updated(term, 1L)
          case None => // decrement-all step: drop zeros, term absorbed
            m.collect { case (t, c) if c > 1 => (t, c - 1) }
        }

      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val summed = b.foldLeft(a) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        if (summed.size <= k) summed
        else {
          // shave the (k+1)-th largest count off every counter: at most
          // k survive, and each estimate drops by ≤ that shave — the
          // error bound telescopes to N/(k+1) across any merge tree
          val shave = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.collect { case (t, c) if c > shave => (t, c - shave) }
        }
      }

      override def finish(m: Map[String, Long]): Map[String, Long] = m

      override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    }
  }

  /** EXACT frequent items at bounded memory: the classic two-pass
    * composition. Pass 1 is the Misra–Gries candidate sweep (≤ k
    * counters anywhere; its guarantee means the candidate set is a
    * SUPERSET of every term with true count · (k+1) > N, however the
    * data is partitioned). Pass 2 recounts ONLY the ≤ k candidates
    * exactly — one aggregation whose group-by key is
    * candidate-or-null, so its state is ≤ k+1 counters — and applies
    * the threshold `cnt · (k+1) > n_total` in integer arithmetic.
    *
    * The result is therefore EXACTLY the set of terms with frequency
    * above N/(k+1) — deterministic and partitioning-independent even
    * though the intermediate candidate set is neither. This is the
    * open-vocabulary frequent-items answer a 100 TB token stream
    * needs: two scans, nothing vocabulary-sized anywhere.
    *
    * Columns: (term, cnt, n_total), ordered by term. */
  def exactHeavyHitters(df: DataFrame, termCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull)
    val candidates: Seq[String] =
      terms.as[String].select(misraGries(k).toColumn.name("mg"))
        .head().keys.toSeq
    // one pass: exact candidate counts AND the total token count —
    // non-candidates collapse into the null group, so ≤ k+1 groups
    val counted = terms
      .groupBy(when(col("term").isin(candidates: _*), col("term"))
        .as("term"))
      .agg(count(lit(1)).as("cnt"))
    val total = counted.agg(sum(col("cnt")).as("n_total"))
    counted.filter(col("term").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("term"), col("cnt"), col("n_total"))
      .orderBy(col("term"))
  }

  /** Heavy-hitter terms of a text corpus: ≤ k (term, weight_low) rows,
    * `weight_low` the guaranteed lower bound on the term's true count.
    * One explode + one bounded-state aggregation — nothing
    * vocabulary-sized exists anywhere in the plan. */
  def heavyTerms(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val summary = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .as[String]
      .select(misraGries(k).toColumn.name("mg"))
    summary.select(explode(col("mg")).as(Seq("term", "weight_low")))
      .orderBy(col("weight_low").desc, col("term"))
  }
}
