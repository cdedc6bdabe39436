package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

/** HyperLogLog: rho definition vs a JVM bit-twiddling reference, merge
  * ≡ recompute-over-union (the sketch-merge contract), partitioning
  * invariance (map-side-combine safety), estimator accuracy inside the
  * published RSE, and the small-range linear-counting path. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def sha52Of(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Reference (bucket, rho) from JVM bit ops, independent of the
    * bin()-string formulation the operator uses. */
  private def refBucketRho(v: String, p: Int): (Int, Int) = {
    val h = sha52Of(v)
    val m = 1 << p
    val w = h / m
    val b1 = Hll.rankBits(p) + 1
    val rho =
      if (w == 0L) b1
      else b1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    ((h % m).toInt, rho)
  }

  test("register rho matches the leading-zero-rank reference bit-for-bit") {
    val p = 6
    val vals = (1 to 400).map(_.toString)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val got = Hll.registers(df, "g", "v", p)
      .select("bucket", "rho").as[(Int, Int)].collect().toMap
    val want = vals.map(v => refBucketRho(v, p))
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got === want)
    // rho stays inside [1, B+1]
    assert(got.values.forall(r => r >= 1 && r <= Hll.rankBits(p) + 1))
  }

  test("merge(registers(A), registers(B)) ≡ registers(A ∪ B)") {
    val p = 6
    val a = (1 to 600).map(i => ("g", s"a$i")).toDF("g", "v")
    val b = (1 to 600).map(i => ("g", s"b${i % 250}")).toDF("g", "v")
    val merged = Hll.mergeRegisters(
        Hll.registers(a, "g", "v", p), Hll.registers(b, "g", "v", p), "g")
      .select("bucket", "rho").as[(Int, Int)].collect().toMap
    val direct = Hll.registers(a.union(b), "g", "v", p)
      .select("bucket", "rho").as[(Int, Int)].collect().toMap
    assert(merged === direct)
  }

  test("registers are invariant to partitioning and duplication") {
    val p = 6
    val df = (1 to 3000).map(i => ("g", (i % 800).toString)).toDF("g", "v")
    def regs(d: org.apache.spark.sql.DataFrame) =
      Hll.registers(d, "g", "v", p)
        .select("bucket", "rho").as[(Int, Int)].collect().toMap
    assert(regs(df.repartition(1)) === regs(df.repartition(17)))
    val dup = (1 to 3000).flatMap(i => Seq.fill(3)(("g", (i % 800).toString)))
      .toDF("g", "v")
    assert(regs(df) === regs(dup))
  }

  test("estimator lands within 4×RSE of the truth at n >> m") {
    val p = 6
    val n = 5000
    val df = (1 to n).map(i => ("g", i.toString)).toDF("g", "v")
    val row = Hll.distinctEstimate(df, "g", "v", p).head()
    val estRaw = row.getAs[Double]("est_raw")
    val rse = 1.04 / math.sqrt(Hll.m(p).toDouble) // ≈ 13% at m=64
    assert(math.abs(estRaw - n) / n < 4 * rse,
      s"est_raw $estRaw vs true $n")
    // n >> 2.5m ⇒ no correction applies
    val corrected = Hll.distinctEstimate(df, "g", "v", p)
      .select(Hll.estimate(p)(col("n_zero"), col("est_raw")).as("e"))
      .head().getAs[Double]("e")
    assert(corrected === estRaw)
  }

  test("small-range linear counting is near-exact at n << m") {
    val p = 6
    val n = 10
    val df = (1 to n).map(i => ("g", i.toString)).toDF("g", "v")
    val corrected = Hll.distinctEstimate(df, "g", "v", p)
      .select(Hll.estimate(p)(col("n_zero"), col("est_raw")).as("e"))
      .head().getAs[Double]("e")
    // linear counting error at V ≈ m−n is a fraction of a count here
    assert(math.abs(corrected - n) < 1.5, s"corrected $corrected vs $n")
  }

  test("s_scaled is the exact integer Σ 2^(B+1−M_j), empty registers included") {
    val p = 6
    val df = Seq(("g", "x"), ("g", "y"), ("g", "z")).toDF("g", "v")
    val regs = Hll.registers(df, "g", "v", p)
      .select("bucket", "rho").as[(Int, Int)].collect().toMap
    val b1 = Hll.rankBits(p) + 1
    val expected = (0 until Hll.m(p)).map { b =>
      1L << (b1 - regs.getOrElse(b, 0))
    }.sum
    val row = Hll.distinctEstimate(df, "g", "v", p).head()
    assert(row.getAs[Long]("s_scaled") === expected)
    assert(row.getAs[Int]("n_zero") === Hll.m(p) - regs.size)
    val num = Hll.alpha(p) * java.lang.Math.scalb(1.0, p + 53)
    assert(row.getAs[Double]("est_raw") === num / expected.toDouble)
  }

  test("streaming registers converge to the batch registers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    // registers() is ONE relational max-aggregation, so it runs as a
    // live streaming agg in complete mode with 64-register state per
    // group — the same bounded-state story as the KMV stream
    val q = Hll.registers(input.toDF().toDF("g", "v"), "g", "v", p = 6)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = (1 to 300).map(i => ("a", s"u${i % 120}"))
      val batch2 = (1 to 300).map(i => ("a", s"w$i")) ++
        (1 to 40).map(i => ("b", s"u$i"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .select("g", "bucket", "rho").as[(String, Int, Int)]
        .collect().toSet
      val batch = Hll.registers((batch1 ++ batch2).toDF("g", "v"),
          "g", "v", p = 6)
        .select("g", "bucket", "rho").as[(String, Int, Int)]
        .collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("null groups and null values are dropped; no such groups emitted") {
    val df = Seq((null.asInstanceOf[String], "x"), ("g", null), ("g", "y"))
      .toDF("g", "v")
    val out = Hll.distinctEstimate(df, "g", "v", 6).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("g") === "g")
    assert(out.head.getAs[Int]("n_zero") === Hll.m(6) - 1)
  }
}
