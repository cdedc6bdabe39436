package graft

import org.apache.spark.sql.functions._

import graft.expressions.RandomProject

class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  test("projection matches the sign-matrix definition exactly") {
    val v = Array(1.5f, -2.0f, 0.25f)
    val outDim = 4
    val got = Seq(Tuple1(v)).toDF("emb")
      .select(RandomProject.project(col("emb"), outDim).as("p"))
      .collect().head.getSeq[Double](0)
    val want = (0 until outDim).map { i =>
      (0 until v.length).map(j =>
        v(j) * RandomProject.sign(i.toLong * v.length + j)).sum /
        math.sqrt(outDim.toDouble)
    }
    assert(got === want)
  }

  test("sign matrix is balanced and position-dependent") {
    val signs = (0L until 1024L).map(RandomProject.sign)
    val plus = signs.count(_ > 0)
    assert(plus > 400 && plus < 624, s"skewed sign distribution: $plus/1024")
    // not constant along rows or columns of a 16×64 layout
    assert((0 until 64).exists(j => RandomProject.sign(j) !=
      RandomProject.sign(64L + j)))
  }

  test("null input row → null; null elements contribute zero") {
    val rows = Seq(Tuple1(null: Array[Float])).toDF("emb")
      .select(RandomProject.project(col("emb"), 4).as("p")).collect()
    assert(rows.head.isNullAt(0))
    val withNull = Seq(Tuple1(Seq(Some(1.0f), None, Some(2.0f)))).toDF("emb")
      .select(RandomProject.project(col("emb"), 2).as("p"))
      .collect().head.getSeq[Double](0)
    val dense = Seq(Tuple1(Seq(Some(1.0f), Some(0.0f), Some(2.0f)))).toDF("emb")
      .select(RandomProject.project(col("emb"), 2).as("p"))
      .collect().head.getSeq[Double](0)
    assert(withNull === dense)
  }

  test("JL: squared norm is preserved in expectation over the fixture") {
    // E[‖Pv‖²] = ‖v‖² for ±1 projections; averaged over 500 vectors the
    // ratio concentrates tightly around 1 (std ≈ √(2/16/500) ≈ 0.016)
    val ratio = Tables.embeddings(spark, sf)
      .select(RandomProject.project(col("embedding"), 16).as("p"),
        col("embedding"))
      .select(
        aggregate(col("p"), lit(0.0), (a, x) => a + x * x).as("pn"),
        aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")).as("vn"))
      .agg(avg(col("pn") / col("vn"))).collect().head.getDouble(0)
    assert(ratio > 0.85 && ratio < 1.15, s"norm ratio off: $ratio")
  }
}
