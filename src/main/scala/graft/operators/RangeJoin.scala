package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins via bucketization — the scale answer to pure
  * range predicates, which Spark otherwise plans as a nested-loop join
  * (O(n²) compares with no equi-key to hash on).
  *
  * Technique: quantize the range dimension into buckets the size of the
  * tolerance; replicate ONE side to its bucket and both neighbors; join
  * on bucket equality (a plain hash join); verify the exact predicate.
  * Any pair within tolerance differs by at most one bucket, so the
  * bucket join finds every qualifying pair exactly once. Cost: 3×
  * replication of one side + output-proportional verify, instead of n².
  */
object RangeJoin {

  /** All pairs (id_a < id_b) whose timestamps lie within
    * `toleranceMicros` of each other. Output: (id_a, id_b, delta_us).
    *
    * PRECONDITION: `idCol` values are unique — duplicate ids would both
    * drop legitimate same-id pairs (the `id_a < id_b` dedup can't order
    * them) and double-emit their cross pairs.
    *
    * Skew note: a burst second concentrates its bucket, and pairs
    * WITHIN a burst are inherently quadratic (that's the output size,
    * not an implementation artifact); cap or pre-aggregate bursty keys
    * upstream when only existence matters. */
  def selfPairsWithin(df: DataFrame, idCol: String, tsCol: String,
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0)
    val pts = df.select(col(idCol).as("id"), unix_micros(col(tsCol)).as("us"))
      .withColumn("bkt", expr(s"us div ${toleranceMicros}L"))

    val a = pts.select(col("bkt"), col("id").as("id_a"), col("us").as("us_a"))
    val b = pts.select(
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"),
        col("id").as("id_b"), col("us").as("us_b"))

    // each qualifying unordered pair matches exactly one replica offset,
    // and the id_a < id_b filter keeps exactly one orientation
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= toleranceMicros)
      .select(col("id_a"), col("id_b"),
        abs(col("us_a") - col("us_b")).as("delta_us"))
  }

  /** Interval-overlap self-join: all pairs (id_a < id_b) whose
    * [start, end] intervals intersect, ends inclusive (touching
    * endpoints overlap with `overlap_us` = 0). The WHICH-pairs
    * companion to `Analytics.activeIntervals`' how-many — double
    * bookings, concurrent sessions, resource-contention audits.
    *
    * Technique: each interval replicates to every `bucketMicros`-wide
    * bucket it touches and pairs meet by bucket equality (hash join, no
    * NLJ). A pair sharing several buckets is emitted ONCE — only in the
    * bucket holding the overlap's start, `greatest(s_a, s_b)`, which
    * both intervals by definition cover. Replication factor is
    * interval length / bucketMicros + 1: size the bucket near the
    * typical interval length. Same skew truth as `selfPairsWithin`:
    * pairs within a burst bucket are the OUTPUT being quadratic, not
    * the plan. Null or inverted (start > end) intervals are dropped.
    * PRECONDITION: unique `idCol` (as in `selfPairsWithin`).
    * Output: (id_a, id_b, overlap_us). */
  def overlappingIntervals(df: DataFrame, idCol: String, startCol: String,
      endCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"need a positive bucket, got $bucketMicros")
    val iv = df.select(col(idCol).as("id"),
        unix_micros(col(startCol)).as("s"), unix_micros(col(endCol)).as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull && col("s") <= col("e"))
      .withColumn("bkts",
        expr(s"sequence(s div ${bucketMicros}L, e div ${bucketMicros}L)"))
    val a = iv.select(explode(col("bkts")).as("bkt"), col("id").as("id_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = iv.select(explode(col("bkts")).as("bkt"), col("id").as("id_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        expr(s"greatest(s_a, s_b) div ${bucketMicros}L") === col("bkt"))
      .select(col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
          .as("overlap_us"))
  }
}
