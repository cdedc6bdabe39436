package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — the batch
  * counterparts of what the reference's dashboards would ask of its
  * aggregate tables: sessionization, funnel conversion, cohort
  * retention. All three are integer/timestamp-exact (no floating
  * point in any grouping key or count), so their DuckDB oracles are
  * hash-exact, not tolerance-fuzzy.
  */
object Analytics {

  /** Gap-based sessionization: consecutive events of one user belong to
    * the same session iff they are ≤ `gapMinutes` apart; a longer gap
    * (or the user's first event) opens a new session. Classic
    * lag-then-running-sum: the window partitions by user, so at scale
    * this is ONE shuffle on the user key; the per-(user, session)
    * rollup that follows combines map-side. Gap comparison is in µs
    * longs (`unix_micros`), not floating seconds — exact, and exactly
    * `epoch_us` in the oracle. The (ts, id) sort key is unique, so the
    * running sum's frame is deterministic.
    * Output: (user, session_idx 1-based, n_events, session_start,
    * session_end). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"need a positive session gap, got $gapMinutes")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val isNew = when(prev.isNull || (us - prev) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Ordered funnel: a user reaches step k iff the FIRST occurrence of
    * each step's event type happens in strict step order
    * (t₁ < t₂ < … < tₖ). One conditional-min aggregation per user
    * (map-side combined — the only shuffle moves one row per user with
    * `steps.size` timestamps), then a `steps.size`-row summary.
    * A missing or out-of-order step breaks the prefix: later steps
    * can't count even if their types occurred (strict-order semantics,
    * mirrored by the CASE chain in the oracle — NULL comparisons fall
    * to the 0 branch in both engines).
    * Output: (step 1-based, step_name, n_users). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"need distinct funnel steps, got $steps")
    val firsts = events.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol))).as("t0"),
        steps.tail.zipWithIndex.map { case (s, i) =>
          min(when(col(typeCol) === s, col(tsCol))).as(s"t${i + 1}")
        }: _*)
    // prefix-AND of the step conditions: cond_k = cond_{k-1} ∧ t_k > t_{k-1}
    val conds = steps.indices.foldLeft(Vector.empty[Column]) { (acc, i) =>
      val step = if (i == 0) col("t0").isNotNull
                 else acc.last && (col(s"t$i") > col(s"t${i - 1}"))
      acc :+ step
    }
    val depth = conds.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    val wide = firsts.agg(
      sum(when(depth >= 1, 1L).otherwise(0L)).as(s"s1"),
      (2 to steps.size).map(k =>
        sum(when(depth >= k, 1L).otherwise(0L)).as(s"s$k")): _*)
    val stepRows = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("step"), lit(name).as("step_name"),
        col(s"s${i + 1}").as("n_users"))
    }
    wide.select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
  }

  /** Cohort retention: users grouped by their first active day; for
    * each cohort and each day offset ≤ `maxOffsetDays`, how many of
    * its users were active. Two map-side-combinable aggregations plus
    * one shuffle join on the user key; counts are exact (the activity
    * frame is (user, day)-distinct before counting).
    * Output: (cohort_day, day_offset int, n_users). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0)
    val firstDay = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(firstDay, userCol)
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
