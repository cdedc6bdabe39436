package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Distributed PCA: the covariance pass against hand-computed moments,
  * planted-component recovery, projection algebra, and the bounded-
  * buffer aggregation's partition invariance (to float tolerance). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches the hand-computed moments") {
    // three 2-d points: mean (2, 1); cov = E[xx] - mu mu^T
    val df = Seq(Seq(1.0, 0.0), Seq(2.0, 1.0), Seq(3.0, 2.0)).toDF("v")
    val (n, mean, cov) = Pca.covariance(df, "v")
    assert(n === 3L)
    assert(mean.toSeq === Seq(2.0, 1.0))
    // E[x0²] = (1+4+9)/3 = 14/3 → var = 14/3 − 4 = 2/3; cross = 2/3 too
    assert(math.abs(cov(0)(0) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(cov(1)(1) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(cov(0)(1) - 2.0 / 3.0) < 1e-12)
    assert(cov(0)(1) === cov(1)(0))
  }

  test("planted dominant direction is recovered") {
    // x_i = s_i · u with u = (3,4)/5 plus small odd-even jitter on the
    // orthogonal axis — variance along u dwarfs the rest
    val u = Array(0.6, 0.8)
    val o = Array(-0.8, 0.6)
    val pts = (1 to 200).map { i =>
      val s = (i % 21).toDouble - 10.0 // spread -10..10 along u
      val j = if (i % 2 == 0) 0.1 else -0.1 // tiny orthogonal jitter
      Seq(s * u(0) + j * o(0), s * u(1) + j * o(1))
    }
    val (_, mean, cov) = Pca.covariance(pts.toDF("v"), "v")
    val Seq((v1, l1), (v2, l2)) = Pca.topComponents(cov, 2, iters = 60)
    val cos1 = math.abs(v1(0) * u(0) + v1(1) * u(1))
    assert(cos1 > 0.9999, s"top component missed the planted axis: $cos1")
    assert(l1 > l2 && l2 >= -1e-9)
    val cos2 = math.abs(v2(0) * o(0) + v2(1) * o(1))
    assert(cos2 > 0.9999, s"deflated component missed the orthogonal: $cos2")
    // eigenvalue ≈ planted variance along u
    val s2 = (1 to 200).map(i => (i % 21).toDouble - 10.0)
    val varU = {
      val m = s2.sum / s2.size
      s2.map(x => (x - m) * (x - m)).sum / s2.size
    }
    assert(math.abs(l1 - varU) / varU < 0.01)
  }

  test("projection is the centered dot product") {
    val df = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(3.0, 5.0))).toDF("id", "v")
    val mean = Array(2.0, 3.0)
    val comp = Array(1.0, 0.0) // projects the centered first coordinate
    val out = Pca.project(df, "id", "v", mean, Seq(comp))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(out.toSeq === Seq((1L, Seq(-1.0)), (2L, Seq(1.0))))
  }

  test("gram pass is partition-invariant to float tolerance") {
    val pts = (1 to 500).map(i =>
      Seq((i % 17).toDouble, (i % 23).toDouble, math.sin(i.toDouble)))
    val (_, m1, c1) = Pca.covariance(pts.toDF("v").repartition(1), "v")
    val (_, m13, c13) = Pca.covariance(pts.toDF("v").repartition(13), "v")
    m1.zip(m13).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    for (i <- c1.indices; j <- c1.indices)
      assert(math.abs(c1(i)(j) - c13(i)(j)) < 1e-12)
  }

  test("null vectors are dropped; dimension mismatch throws") {
    val withNull = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v")
    assert(Pca.covariance(withNull, "v")._1 === 2L)
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      Pca.covariance(ragged, "v")
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }
}
