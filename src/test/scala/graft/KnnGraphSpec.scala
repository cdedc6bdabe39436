package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** NN-Descent k-NN graph (Dong et al., WWW'11): exact convergence on
  * data satisfying the descent premise (neighborhood correlation),
  * determinism of the seedless start, the searchK mixing knob, and the
  * family's zero-vector/null contracts. The registered q_knn_graph is
  * additionally oracle-checked against the exhaustive all-pairs
  * formulation at all three SFs. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters of 8 with a distinct jitter dim — true
    * top-3 are the jitter-nearest clustermates. */
  private def clusteredDf = {
    val pts = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(6)(0.0)
      base(c) = 10.0
      base(3 + c) = 1.0 + 0.01 * i
      (i.toLong, base.toSeq)
    }
    pts.toDF("id", "v")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("converges to the exact graph on clustered data (≡ brute force)") {
    val got = Similarity.knnGraph(clusteredDf, "id", "v", k = 3,
      iterations = 3, searchK = 8)
    val want = Similarity.bruteForceTopK(clusteredDf, clusteredDf,
      "id", "v", k = 3)
    assert(pairs(got) === pairs(want))
  }

  test("converges on a 1-D manifold (golden-angle circle, the registered shape)") {
    // 120 points on a circle + a small distinct radial jitter: true
    // neighbors are angular neighbors — the premise NN-Descent needs
    val n = 120
    val pts = (0 until n).map { i =>
      val th = 2 * math.Pi * ((i * 0.618033988749895) % 1.0)
      (i.toLong, Seq(4 * math.cos(th), 4 * math.sin(th), 0.001 * (i % 7)))
    }
    val df = pts.toDF("id", "v")
    val got = Similarity.knnGraph(df, "id", "v", k = 5,
      iterations = 6, searchK = 16)
    val want = Similarity.bruteForceTopK(df, df, "id", "v", k = 5)
    assert(pairs(got) === pairs(want))
  }

  test("deterministic: identical output across runs (seedless sha ring)") {
    val a = pairs(Similarity.knnGraph(clusteredDf, "id", "v", 3, 2, 8))
    val b = pairs(Similarity.knnGraph(clusteredDf, "id", "v", 3, 2, 8))
    assert(a === b)
  }

  test("zero vectors and null ids are excluded; searchK < k rejected") {
    val df = clusteredDf.unionByName(Seq(
      (100L, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))).toDF("id", "v"))
      .unionByName(Seq((Option.empty[Long], Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
        .toDF("id", "v"))
    val g = Similarity.knnGraph(df, "id", "v", k = 3, iterations = 2,
      searchK = 8).collect()
    assert(!g.exists(r => r.getLong(0) == 100L || r.getLong(1) == 100L))
    assert(g.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    intercept[IllegalArgumentException](
      Similarity.knnGraph(clusteredDf, "id", "v", k = 5, iterations = 1,
        searchK = 3))
  }

  test("empty input yields an empty graph") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(Similarity.knnGraph(empty, "id", "v", 3, 2).count() === 0L)
  }

  test("requireConverged: certified fixpoint passes; starved budget fails loudly") {
    // enough rounds + mixing → fixpoint reached and certified; result
    // unchanged vs the unguarded call
    val ok = Similarity.knnGraph(clusteredDf, "id", "v", k = 3,
      iterations = 6, searchK = 8, requireConverged = true)
    assert(pairs(ok) === pairs(Similarity.knnGraph(clusteredDf, "id", "v",
      3, 3, 8)))
    // 1 round from the ring start cannot certify a stable output on
    // the circle (certification needs an unchanged round, and round 1
    // changes the init lists) → the guard must throw, not return a
    // partial graph
    val n = 120
    val pts = (0 until n).map { i =>
      val th = 2 * math.Pi * ((i * 0.618033988749895) % 1.0)
      (i.toLong, Seq(4 * math.cos(th), 4 * math.sin(th), 0.001 * (i % 7)))
    }
    val df = pts.toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Similarity.knnGraph(df, "id", "v", k = 5, iterations = 1,
        searchK = 16, requireConverged = true).count())
    assert(e.getMessage.contains("still moving"))
  }

  test("early-stop at fixpoint: extra budget is free and result-identical") {
    // iterations=3 reaches the fixpoint on the clustered fixture;
    // iterations=50 must early-stop there, not run 50 rounds (wall
    // clock would explode) and must emit the identical graph
    val t0 = System.nanoTime()
    val big = pairs(Similarity.knnGraph(clusteredDf, "id", "v", k = 3,
      iterations = 50, searchK = 8, requireConverged = true))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(big === pairs(Similarity.knnGraph(clusteredDf, "id", "v",
      3, 3, 8)))
    assert(secs < 60.0, s"50-round budget took ${secs}s — early-stop broken?")
  }
}
