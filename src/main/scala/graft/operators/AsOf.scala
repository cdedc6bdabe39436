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
    require(rightValueCols.intersect(lCols).isEmpty,
      s"right value columns ${rightValueCols.intersect(lCols)} collide with left columns")
    require(!lCols.exists(_.startsWith("__")),
      "left columns must not use the reserved __ prefix")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"timestamp types must match exactly (got ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}) — an implicit union cast (e.g. " +
        "date→timestamp) would silently apply the session timezone; cast explicitly")

    // the right row travels as ONE struct so the matched row is attached
    // as a unit — per-column carry would backfill a genuinely-NULL field
    // of the latest row with a stale value from an older row
    val rStruct = struct(rightValueCols.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType

    val lSide = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__isL")) ++
        lCols.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    // NULL right keys/timestamps can never satisfy key-equality + ts<=
    // semantics (DuckDB ASOF agrees) — and NULLS FIRST ordering would
    // otherwise carry a null-ts row's values into every left row
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__isL")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          rStruct.as("__r"): _*)

    // right rows order BEFORE left rows at equal ts (__isL asc) ⇒ a right
    // row at exactly leftTs is visible to that left row: `<=` semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
      .select(lCols.map(col) ++
        rightValueCols.map(c => col("__c").getField(c).as(c)): _*)
  }
}
