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

  // ----- randomized range-finder (Halko et al. 2011) -----

  private def cosSim(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("randomized range-finder recovers a planted component at d = 1024") {
    val d = 1024
    // deterministic planted direction + small hash noise; spread
    // factor s in -3..3 gives the component ~200x the noise variance
    def h(k: Long): Double =
      (((k * 2654435761L) >>> 17) & 0xffff).toDouble / 65536.0 - 0.5
    val vp = Array.tabulate(d)(j => (if (h(j) > 0) 1.0 else -1.0) / math.sqrt(d))
    val rows = (0 until 400).map { i =>
      val s = (i % 7 - 3).toDouble
      Array.tabulate(d)(j => s * vp(j) + 0.02 * h(i.toLong * d + j)).toSeq
    }
    val df = rows.toDF("v")
    val (n, _, comps) = Pca.randomizedComponents(df, "v", ell = 24, r = 1)
    assert(n === 400L)
    val (v1, lambda1) = comps.head
    assert(math.abs(cosSim(v1, vp)) > 0.99,
      s"planted cos = ${cosSim(v1, vp)}")
    // Var(s) for s uniform on -3..3 = 4
    assert(lambda1 > 3.0 && lambda1 < 5.0, s"lambda = $lambda1")
  }

  test("randomized components agree with the exact Gram path at small d") {
    val d = 32
    def h(k: Long): Double =
      (((k * 0x9e3779b97f4a7c15L) >>> 20) & 0xffff).toDouble / 65536.0 - 0.5
    val vp = Array.tabulate(d)(j => math.sin(j + 1.0))
    val nvp = math.sqrt(vp.map(x => x * x).sum)
    val vpn = vp.map(_ / nvp)
    val rows = (0 until 300).map { i =>
      val s = (i % 5 - 2).toDouble * 2
      Array.tabulate(d)(j => s * vpn(j) + 0.1 * h(i.toLong * d + j)).toSeq
    }
    val df = rows.toDF("v")
    val (_, _, exact) = {
      val (n, mean, cov) = (Pca.covariance(df, "v") match {
        case (a, b, c) => (a, b, c)
      })
      (n, mean, Pca.topComponents(cov, 1, 30))
    }
    val (_, _, rand) = Pca.randomizedComponents(df, "v", ell = 12, r = 1,
      iters = 30)
    assert(math.abs(cosSim(exact.head._1, rand.head._1)) > 0.999)
    assert(math.abs(exact.head._2 - rand.head._2) < 0.01 * exact.head._2)
  }

  test("randomized path is deterministic and validates its arguments") {
    val rows = (0 until 50).map(i =>
      Seq.tabulate(16)(j => ((i * 16 + j) % 11).toDouble))
    val df = rows.toDF("v")
    val a = Pca.randomizedComponents(df, "v", ell = 8, r = 2)
    val b = Pca.randomizedComponents(df, "v", ell = 8, r = 2)
    assert(a._3.map(_._2) === b._3.map(_._2))
    assert(a._3.head._1.toSeq === b._3.head._1.toSeq)
    intercept[IllegalArgumentException](
      Pca.randomizedComponents(df, "v", ell = 17, r = 1))
    intercept[IllegalArgumentException](
      Pca.randomizedComponents(df, "v", ell = 8, r = 9))
    // rank-deficient: all rows identical => zero covariance range
    val flat = Seq.fill(20)(Seq.fill(16)(3.0)).toDF("v")
    intercept[IllegalArgumentException](
      Pca.randomizedComponents(flat, "v", ell = 4, r = 1))
  }
}
