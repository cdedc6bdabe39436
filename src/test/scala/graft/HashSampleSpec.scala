package graft

import org.apache.spark.sql.functions._

import graft.functions.HashSample

/** Hash-rank samples: the sample equals the brute-force bottom-k by
  * (sha52(id), value), is invariant to partitioning and replay, caps
  * at k, and the sampled quantiles track the exact ones within the
  * DKW rank bound. */
class HashSampleSpec extends SparkSpec {
  import spark.implicits._

  private def sha52Of(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  private def fixture(n: Int) =
    (1 to n).map(i => ("g", i.toLong, (i * 37 % n).toDouble))

  test("sample is the brute-force bottom-k by (hash, value)") {
    val rows = fixture(500)
    val df = rows.toDF("g", "id", "v")
    val k = 32
    val got = HashSample.sample(df, "g", "id", "v", k)
      .select("hash", "value").as[(Long, Double)].collect().toSeq
      .sortBy(identity)
    val want = rows.map { case (_, id, v) => (sha52Of(id.toString), v) }
      .sorted.take(k)
    assert(got === want)
  }

  test("sample is invariant to partitioning and row replay") {
    val df = fixture(300).toDF("g", "id", "v")
    def s(d: org.apache.spark.sql.DataFrame) =
      HashSample.sample(d, "g", "id", "v", 16)
        .select("hash", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(s(df.repartition(1)) === s(df.repartition(13)))
    val replayed = df.union(df).union(df)
    assert(s(df) === s(replayed)) // distinct pairs: replay adds nothing
  }

  test("fewer rows than k returns them all; sample caps at k") {
    val df = fixture(5).toDF("g", "id", "v")
    assert(HashSample.sample(df, "g", "id", "v", 16).count() === 5)
    assert(HashSample.sample(fixture(100).toDF("g", "id", "v"),
      "g", "id", "v", 16).count() === 16)
  }

  test("sampled quantiles track exact quantiles within the DKW bound") {
    val n = 4000
    val k = 256
    val df = fixture(n).toDF("g", "id", "v")
    val row = HashSample.sampleQuantiles(df, "g", "id", "v", k,
      Seq(0.5, 0.9)).head()
    assert(row.getAs[Int]("n_sample") === k)
    // rank-space error ~ sqrt(q(1-q)/k); 4 sigma in value space of a
    // near-uniform fixture (values span [0, n))
    def bound(q: Double) = 4 * math.sqrt(q * (1 - q) / k) * n
    val exact = df.agg(percentile(col("v"), lit(0.5)),
      percentile(col("v"), lit(0.9))).head()
    assert(math.abs(row.getAs[Double]("p50_sample") - exact.getDouble(0))
      < bound(0.5))
    assert(math.abs(row.getAs[Double]("p90_sample") - exact.getDouble(1))
      < bound(0.9))
  }

  test("null group, id, or value rows are dropped") {
    val df = Seq(
      (null.asInstanceOf[String], java.lang.Long.valueOf(1L), java.lang.Double.valueOf(1.0)),
      ("g", null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(2.0)),
      ("g", java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Double]),
      ("g", java.lang.Long.valueOf(4L), java.lang.Double.valueOf(4.0)))
      .toDF("g", "id", "v")
    val out = HashSample.sample(df, "g", "id", "v", 8).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("value") === 4.0)
  }

  test("quantile names reject non-whole-percent requests") {
    assertThrows[IllegalArgumentException] {
      HashSample.nameFor(0.505)
    }
    assert(HashSample.nameFor(0.9) === "p90_sample")
  }
}
