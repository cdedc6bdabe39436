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
  * histories.) Skewed hot keys concentrate one partition; for those use
  * [[asofJoinBucketed]], which spreads each key over coarse-time
  * buckets (result-invariant, property-tested in AsOfSpec).
  *
  * Requirement: at most one right row per (key, ts) — pre-aggregate the
  * right side otherwise (ties inside one instant are ambiguous in any
  * as-of semantics, incl. DuckDB's ASOF JOIN, our oracle).
  */
object AsOf {

  private def validate(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, rightValueCols: Seq[String]): Unit = {
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
  }

  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    validate(left, leftTs, right, rightTs, rightValueCols)
    val lCols = left.columns.toSeq

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

  /** Forward as-of join: for every left row, the EARLIEST right row
    * with the same key and `rightTs >= leftTs` — "next scheduled
    * maintenance", "first event after the deploy", the mirror of
    * [[asofJoin]]. Same union + one-shuffle window technique, with the
    * carry reversed: `first(ignoreNulls) OVER (rows current →
    * unbounded following)`, and LEFT rows ordering before right rows
    * at equal ts so a right row at exactly leftTs is inside the
    * frame (`>=` inclusive). Same uniqueness requirement. */
  def asofJoinForward(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    validate(left, leftTs, right, rightTs, rightValueCols)
    val lCols = left.columns.toSeq
    val rStruct = struct(rightValueCols.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lSide = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__isL")) ++
        lCols.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__isL")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          rStruct.as("__r"): _*)
    // left (isL 1) before right (isL 0) at equal ts, so the forward
    // frame starting at the left row still sees an equal-ts right row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isL").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lSide.unionByName(rSide)
      // a NULL left ts sorts FIRST, so the forward frame would hand it
      // the key's earliest right row — the mirror of the null hazard
      // the backward join's ordering note guards; "ts >= NULL" is
      // unknowable, so such rows stay unmatched
      .withColumn("__c", when(col("__ts").isNull, lit(null).cast(rType))
        .otherwise(first(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__isL") === 1)
      .select(lCols.map(col) ++
        rightValueCols.map(c => col("__c").getField(c).as(c)): _*)
  }

  /** Nearest as-of join over TIMESTAMP keys: for every left row, the
    * right row with the same key minimizing |rightTs − leftTs|, ties
    * to the BACKWARD (earlier-or-equal) row. Both directional carries
    * run over ONE keyed shuffle (two in-partition sorts, same
    * partitioning); the winner is picked per row from the two carried
    * structs by microsecond distance. */
  def asofJoinNearest(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    validate(left, leftTs, right, rightTs, rightValueCols)
    val lCols = left.columns.toSeq
    val rStruct = struct(col(rightTs).as("__rts") +:
      rightValueCols.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lSide = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__isL")) ++
        lCols.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__isL")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          rStruct.as("__r"): _*)
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isL").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dB = abs(unix_micros(col("__ts")) -
      unix_micros(col("__cb").getField("__rts")))
    val dF = abs(unix_micros(col("__cf").getField("__rts")) -
      unix_micros(col("__ts")))
    lSide.unionByName(rSide)
      .withColumn("__cb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__cf", first(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__isL") === 1)
      .withColumn("__c",
        // |Δts| is unknowable for a NULL left ts (and the forward
        // carry would otherwise claim it — nulls sort first)
        when(col("__ts").isNull, lit(null).cast(rType))
          .when(col("__cb").isNull, col("__cf"))
          .when(col("__cf").isNull, col("__cb"))
          .when(dB <= dF, col("__cb"))
          .otherwise(col("__cf")))
      .select(lCols.map(col) ++
        rightValueCols.map(c => col("__c").getField(c).as(c)): _*)
  }

  /** Skew-safe as-of join: same semantics as [[asofJoin]], but each key's
    * rows are spread over coarse-time buckets so a single pathological hot
    * key no longer lands in ONE window partition.
    *
    * `bucket` maps the (non-null) timestamp column to a bucket id and MUST
    * be monotone non-decreasing in the timestamp (e.g.
    * `ts => floor(unix_micros(ts) / lit(3600000000L))` for hourly buckets);
    * a non-monotone mapping silently breaks the carry-in ordering.
    *
    * Technique: three passes, all bounded.
    *   1. Per (key, bucket) reduce the right side to its latest row
    *      (`max_by`, map-side combinable) — one row per non-empty bucket.
    *   2. Over that TINY per-bucket summary (rows = distinct buckets, not
    *      input rows), a per-key window computes each bucket's carry-in:
    *      the latest right row from any strictly-earlier bucket.
    *   3. The main union+carry pass from [[asofJoin]] runs partitioned by
    *      (key, bucket) — hot keys now split across buckets — with the
    *      carry-in injected as a synthetic row ordered before everything
    *      in its bucket (null ts + seq 0; right rows seq 1, left rows
    *      seq 2, so a right row at exactly leftTs still wins: `<=`).
    *
    * Cost: one extra aggregation of the right side and one extra shuffle
    * of the left's distinct (key, bucket) pairs vs [[asofJoin]]'s single
    * shuffle — worth it only when a hot key dominates. Result-invariant
    * w.r.t. [[asofJoin]] for any bucket width (property-tested in
    * AsOfSpec).
    */
  def asofJoinBucketed(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightValueCols: Seq[String], bucket: Column => Column): DataFrame = {
    validate(left, leftTs, right, rightTs, rightValueCols)
    val lCols = left.columns.toSeq
    val tsType = left.schema(leftTs).dataType

    val rStruct = struct(rightValueCols.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType

    val rKeyed = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTs).as("__ts"),
        bucket(col(rightTs)).as("__b"), rStruct.as("__r"))

    // 1. latest right row per (key, bucket) — the only row later buckets
    // can ever need (requirement: unique (key, ts) makes max_by exact)
    val bucketLatest = rKeyed.groupBy("__k", "__b")
      .agg(max_by(col("__r"), col("__ts")).as("__r"))

    // 2. carry-in per LEFT bucket from the per-bucket summary; a null left
    // bucket (null leftTs) sorts first and so carries nothing — null-ts
    // left rows stay unmatched, same as asofJoin
    val leftBuckets = left
      .select(col(leftKey).as("__k"), bucket(col(leftTs)).as("__b"))
      .distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryRows = leftBuckets.withColumn("__hasL", lit(true))
      .join(bucketLatest, Seq("__k", "__b"), "full_outer")
      .withColumn("__carry", last(col("__r"), ignoreNulls = true).over(wCarry))
      .filter(col("__hasL") && col("__carry").isNotNull)
      .select(Seq(col("__k"), lit(null).cast(tsType).as("__ts"), col("__b"),
          lit(0).as("__seq")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__carry").as("__r"): _*)

    // 3. in-bucket union+carry; carry-in (null ts, seq 0) orders before all
    // real rows, right (seq 1) before left (seq 2) at equal ts
    val lSide = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"),
          bucket(col(leftTs)).as("__b"), lit(2).as("__seq")) ++
        lCols.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    val rSide = rKeyed.select(
      Seq(col("__k"), col("__ts"), col("__b"), lit(1).as("__seq")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__r"): _*)

    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts").asc_nulls_first, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide).unionByName(carryRows)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__seq") === 2)
      .select(lCols.map(col) ++
        rightValueCols.map(c => col("__c").getField(c).as(c)): _*)
  }
}
