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
}
