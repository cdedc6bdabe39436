package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the value columns
  * of the LATEST right row with the same key and `rightTs <= leftTs` —
  * the point-in-time lookup Spark has no built-in operator for
  * (enrich events with the most recent dimension version, trades with
  * the prevailing quote, …).
  *
  * Technique: union both sides into one keyed stream, sort each key
  * partition by (ts, side) — right rows first on ties, giving `<=`
  * semantics — and carry the right values forward with
  * `last(ignoreNulls) OVER (rows unbounded preceding)`. Left rows then
  * read the carried value; right rows are dropped.
  *
  * Scale: ONE hash shuffle on the key plus an in-partition sort —
  * cost ≡ a sort-merge join, with no per-row range probe and no
  * inequality-join blowup. (A naive `l JOIN r ON key AND rts <= lts`
  * + max-window is a many-to-many join that explodes on dense right
  * histories.) Skewed hot keys concentrate one partition; for those,
  * pre-bucket the right side by coarse time and salt within buckets.
  *
  * Requirement: at most one right row per (key, ts) — pre-aggregate the
  * right side otherwise (ties inside one instant are ambiguous in any
  * as-of semantics, incl. DuckDB's ASOF JOIN, our oracle).
  */
object AsOf {

  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    require(rightValueCols.nonEmpty, "asofJoin needs right value columns to carry")
    val lCols = left.columns.toSeq

    val lSide = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__isL")) ++
        lCols.map(col) ++
        rightValueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rSide = right.select(
      Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__isL")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)

    // right rows order BEFORE left rows at equal ts (__isL asc) ⇒ a right
    // row at exactly leftTs is visible to that left row: `<=` semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .select(col("*") +: rightValueCols.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
      .filter(col("__isL") === 1)
      .select(lCols.map(col) ++ rightValueCols.map(c => col(s"__c_$c").as(c)): _*)
  }
}
