package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-min sketch: the one-sided error contract (estimates never
  * undercount), collision-free exactness at large w, monotonicity in
  * d, and build invariance to partitioning. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: value i appears (101 - i) times, over a universe
  // of 100 values — large enough that w=16 MUST collide (pigeonhole)
  private lazy val corpus =
    (1 to 100).flatMap(i => Seq.fill(101 - i)(s"v$i")).toDF("v")

  private def estimates(d: Int, w: Int) = {
    val cm = CountMin.table(corpus, "v", d, w)
    CountMin.pointEstimates(corpus, cm, "v", d, w)
      .withColumnRenamed("value", "v")
  }

  private lazy val exact = corpus.groupBy("v")
    .agg(count(lit(1)).as("exact"))

  test("estimates never undercount, even under forced collisions") {
    val joined = estimates(d = 4, w = 16).join(exact, "v")
      .select(col("v"), col("est_count"), col("exact")).collect()
    assert(joined.length === 100)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"${r.getString(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)}")
    }
    // and w=16 for 100 values genuinely overcounts somewhere —
    // otherwise this spec tests nothing
    assert(joined.exists(r => r.getLong(1) > r.getLong(2)))
  }

  test("collision-free width recovers exact counts") {
    val joined = estimates(d = 4, w = 1 << 16).join(exact, "v").collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("est_count") === r.getAs[Long]("exact"))
    }
  }

  test("more rows can only tighten the estimate") {
    val e1 = estimates(d = 1, w = 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e4 = estimates(d = 4, w = 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // row 0 of the d=4 sketch IS the d=1 sketch, and min over a
    // superset of rows cannot exceed any member
    e4.foreach { case (v, est) => assert(est <= e1(v)) }
  }

  test("sketch table is invariant to input partitioning") {
    def tbl(parts: Int) =
      CountMin.table(corpus.repartition(parts), "v", 4, 64)
        .orderBy("cm_row", "cm_bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tbl(1) === tbl(13))
  }

  test("inner-product estimate upper-bounds the true self-join size") {
    val exact = (1 to 100).map(i => (101L - i) * (101L - i)).sum
    val cmN = CountMin.table(corpus, "v", 4, 32) // forced collisions
    val est = CountMin.innerProductEstimate(cmN, cmN)
      .head().getLong(0)
    assert(est >= exact)
    // collision-free width: the bound is tight
    val cmW = CountMin.table(corpus, "v", 4, 1 << 16)
    assert(CountMin.innerProductEstimate(cmW, cmW).head().getLong(0)
      === exact)
  }

  test("cross-table inner product bounds the equi-join cardinality") {
    // B holds only the even values, 3 copies each → |A ⋈ B| =
    // Σ_{even i} (101-i)·3
    val b = (1 to 100).filter(_ % 2 == 0)
      .flatMap(i => Seq.fill(3)(s"v$i")).toDF("v")
    val exact = (1 to 100).filter(_ % 2 == 0).map(i => (101L - i) * 3L).sum
    val est = CountMin.innerProductEstimate(
      CountMin.table(corpus, "v", 4, 64), CountMin.table(b, "v", 4, 64))
      .head().getLong(0)
    assert(est >= exact)
    val tight = CountMin.innerProductEstimate(
      CountMin.table(corpus, "v", 4, 1 << 16),
      CountMin.table(b, "v", 4, 1 << 16)).head().getLong(0)
    assert(tight === exact)
  }

  test("disjoint corpora with no shared cells estimate join size 0") {
    // two single-value corpora; w wide enough that their cells differ
    val a = Seq.fill(5)("only-in-a").toDF("v")
    val b = Seq.fill(7)("only-in-b").toDF("v")
    val est = CountMin.innerProductEstimate(
      CountMin.table(a, "v", 4, 1 << 16), CountMin.table(b, "v", 4, 1 << 16))
      .head()
    assert(!est.isNullAt(0) && est.getLong(0) === 0L)
  }

  test("null values are dropped from build and probe") {
    val df = Seq(Some("a"), Some("a"), None).toDF("v")
    val cm = CountMin.table(df, "v", 2, 8)
    val est = CountMin.pointEstimates(df, cm, "v", 2, 8).collect()
    assert(est.length === 1)
    assert(est.head.getLong(1) === 2L)
  }
}
