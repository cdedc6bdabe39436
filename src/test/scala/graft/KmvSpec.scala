package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** KMV / theta sketches: exactness below k, estimator arithmetic,
  * merge-order invariance (the bounded-state map-side-combine
  * contract), and the theta set-algebra identities. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def sha52Of(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  test("unsaturated sketch returns the EXACT distinct count") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L),
      ("b", 7L), ("b", 7L)).toDF("g", "v")
    val out = Kmv.distinctEstimate(df, "g", "v", k = 16)
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSeq === Seq(("a", 3, 3.0), ("b", 1, 1.0)))
  }

  test("saturated estimate matches the hand-computed (k-1)*M/h_k") {
    val n = 500
    val k = 64
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
    val out = Kmv.distinctEstimate(df, "g", "v", k).collect()
    val hk = (1 to n).map(i => sha52Of(i.toString)).sorted.apply(k - 1)
    val expected = (k - 1).toDouble * Kmv.M / hk.toDouble
    assert(out.head.getInt(1) === k)
    assert(out.head.getDouble(2) === expected) // bit-identical, not ≈
    // and the estimator is actually in the right neighborhood:
    // RSE ≈ 1/sqrt(k-2) ≈ 12.7%, allow 4σ
    assert(math.abs(expected - n) / n < 0.51)
  }

  test("sketch hashes are invariant to partitioning (merge order)") {
    val df = (1 to 2000).map(i => ("g", (i % 700).toLong)).toDF("g", "v")
    val a = Kmv.sketch(df.repartition(1), "g", "v", 32)
      .select("hashes").as[Seq[Long]].head()
    val b = Kmv.sketch(df.repartition(13), "g", "v", 32)
      .select("hashes").as[Seq[Long]].head()
    assert(a === b)
    assert(a === a.distinct.sorted) // sorted ascending, distinct
    assert(a.size === 32)
  }

  test("duplicate values add no sketch evidence") {
    val once = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val dup = (1 to 100).flatMap(i => Seq.fill(5)(("g", i.toLong)))
      .toDF("g", "v")
    val sa = Kmv.sketch(once, "g", "v", 16).select("hashes")
      .as[Seq[Long]].head()
    val sb = Kmv.sketch(dup, "g", "v", 16).select("hashes")
      .as[Seq[Long]].head()
    assert(sa === sb)
  }

  test("null group keys and null values are dropped") {
    val df = Seq((Some("a"), Some(1L)), (Some("a"), None),
      (None, Some(2L)), (None, None)).toDF("g", "v")
    val out = Kmv.distinctEstimate(df, "g", "v", 8).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 1)))
  }

  test("theta overlap: identical corpora estimate Jaccard 1.0") {
    val a = (1 to 400).map(i => Tuple1(s"v$i")).toDF("v")
    val out = Kmv.overlapEstimate(a, a, "v", k = 64).collect().head
    assert(out.getAs[Double]("jaccard_est") === 1.0)
    assert(out.getAs[Double]("est_inter") === out.getAs[Double]("est_a"))
    // θ = h_(k) itself is EXCLUDED by the strict < θ sample rule, so
    // the θ-sample of a saturated sketch holds k−1 hashes — the same
    // k−1 the (k−1)·M/h_(k) estimator counts, keeping est_inter ≡ est_a
    assert(out.getAs[Int]("n_inter") === 63)
  }

  test("theta overlap: disjoint unsaturated corpora are exact") {
    val a = (1 to 30).map(i => Tuple1(s"a$i")).toDF("v")
    val b = (1 to 20).map(i => Tuple1(s"b$i")).toDF("v")
    val out = Kmv.overlapEstimate(a, b, "v", k = 64).collect().head
    assert(out.getAs[Int]("n_inter") === 0)
    assert(out.getAs[Double]("est_inter") === 0.0)
    assert(out.getAs[Double]("est_a") === 30.0)
    assert(out.getAs[Double]("est_b") === 20.0)
    assert(out.getAs[Double]("est_union") === 50.0)
    assert(out.getAs[Double]("jaccard_est") === 0.0)
  }

  test("streaming sketch converges to the batch sketch across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    // Kmv.sketch is streaming-compatible as-is: a typed bounded-buffer
    // aggregation is exactly what an unbounded distinct stream needs —
    // state per group is k longs, not the key universe
    val q = Kmv.sketch(input.toDF().toDF("g", "v"), "g", "v", k = 16)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1 to 40).map(i => ("a", (i % 25).toLong)): _*)
      q.processAllAvailable()
      input.addData((1 to 40).map(i => ("a", (i % 60).toLong)): _*)
      input.addData((1 to 10).map(i => ("b", i.toLong)): _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream")
        .select("g", "hashes").as[(String, Seq[Long])].collect().toMap
      val batch = Kmv.sketch(
        ((1 to 40).map(i => ("a", (i % 25).toLong)) ++
          (1 to 40).map(i => ("a", (i % 60).toLong)) ++
          (1 to 10).map(i => ("b", i.toLong))).toDF("g", "v"),
        "g", "v", k = 16)
        .select("g", "hashes").as[(String, Seq[Long])].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("theta overlap: half-overlapping saturated corpora land near truth") {
    // A = 1..600, B = 301..900 → |A∩B| = 300, |A∪B| = 900, J = 1/3
    val a = (1 to 600).map(i => Tuple1(s"x$i")).toDF("v")
    val b = (301 to 900).map(i => Tuple1(s"x$i")).toDF("v")
    val out = Kmv.overlapEstimate(a, b, "v", k = 128).collect().head
    val j = out.getAs[Double]("jaccard_est")
    assert(j > 0.15 && j < 0.55, s"jaccard_est $j far from 1/3")
    val u = out.getAs[Double]("est_union")
    assert(u > 600 && u < 1350, s"est_union $u far from 900")
  }
}
