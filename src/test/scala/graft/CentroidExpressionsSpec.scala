package graft

import org.apache.spark.sql.functions._

import graft.expressions.CentroidExpressions
import graft.operators.Similarity

/** TopCentroids: ordering parity with the compositional
  * array-of-struct scorer it replaced, both eval paths. */
class CentroidExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val cents: Array[(Int, Array[Double], Double)] = {
    val rnd = new scala.util.Random(3)
    Array.tabulate(6) { i =>
      val v = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      (i, v, math.sqrt(v.map(x => x * x).sum))
    }
  }

  private val vecs = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(40)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  /** The compositional scorer TopCentroids replaced, verbatim. */
  private def cellScores(vec: org.apache.spark.sql.Column,
      vnorm: org.apache.spark.sql.Column) =
    array(cents.map { case (cell, cv, cn) =>
      struct(
        (Similarity.dotProduct(vec, array(cv.map(lit): _*)) / (vnorm * lit(cn)))
          .as("score"),
        lit(cell).as("cell"))
    }: _*)

  private def base = vecs.toDF("id", "v")
    .withColumn("n", Similarity.l2Norm(col("v")))

  test("nTop=1 equals array_max over struct(score, cell)") {
    val exp = base.select(col("id"),
        array_max(cellScores(col("v"), col("n"))).getField("cell").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = base.select(col("id"),
        CentroidExpressions.topCentroids(col("v"), col("n"), cents, 1)
          .getItem(0).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === exp)
  }

  test("nTop=k equals sort_array(desc) + slice, full ranking") {
    val exp = base.select(col("id"),
        slice(sort_array(cellScores(col("v"), col("n")), asc = false), 1, 4)
          .getField("cell").as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = base.select(col("id"),
        CentroidExpressions.topCentroids(col("v"), col("n"), cents, 4).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got === exp)
  }

  test("score ties rank the larger cell first (struct-ordering parity)") {
    // two identical centroids => guaranteed score tie; compositional
    // sort_array(desc) puts the larger cell id first
    val dup = Array(
      (0, Array.fill(dim)(0.5), math.sqrt(dim * 0.25)),
      (1, Array.fill(dim)(0.5), math.sqrt(dim * 0.25)),
      (2, Array.fill(dim)(-0.5), math.sqrt(dim * 0.25)))
    val out = Seq((1L, Array.fill(dim)(1.0f))).toDF("id", "v")
      .withColumn("n", Similarity.l2Norm(col("v")))
      .select(CentroidExpressions.topCentroids(col("v"), col("n"), dup, 3).as("cs"))
      .collect().head.getSeq[Int](0)
    assert(out === Seq(1, 0, 2))
  }

  test("interpreted eval path agrees with codegen") {
    val expr = CentroidExpressions.topCentroids(col("v"), col("n"), cents, 3).as("cs")
    val codegen = base.select(col("id"), expr).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = base.select(col("id"), expr).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(interp === codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null vector propagates null") {
    val r = Seq((1L, Option.empty[Array[Float]])).toDF("id", "v")
      .withColumn("n", lit(1.0))
      .select(CentroidExpressions.topCentroids(col("v"), col("n"), cents, 1).as("cs"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("wrong dimensionality fails loudly") {
    val ex = intercept[Exception] {
      Seq((1L, Array.fill(dim + 2)(0.1f))).toDF("id", "v")
        .withColumn("n", lit(1.0))
        .select(CentroidExpressions.topCentroids(col("v"), col("n"), cents, 1))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t => Option(t.getMessage).exists(_.contains("dims"))))
  }
}
