package graft
import org.apache.spark.sql.DataFrame
object Bench {
  /** Force FULL evaluation of every output column: a `count()` lets
    * Catalyst prune projections and sorts entirely (a projection-only
    * query would benchmark a bare row count), while the noop sink
    * materializes each row. */
  private def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local("graft-bench", cpus)
    // warmup: exercise codegen/JIT + file listing once so the first
    // measured query doesn't absorb JVM startup (~3 s of noise)
    try exhaust(SparkEntry.queries("q1_lineitem_agg")(spark, sfDir))
    catch { case _: Throwable => () }
    // two passes, min per query: damps GC/compilation jitter so the
    // driver's 2×-of-baseline comparison tracks the engine, not noise.
    // Failures are loud (stderr) and recorded as -1, never as a tiny
    // elapsed-to-failure time that would shrink the total.
    def time(name: String, fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { exhaust(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }
    // local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b times a subset.
    // The driver never sets it, so official artifacts always cover the
    // full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    def once(): Map[String, Double] =
      selected.map { case (name, fn) => name -> time(name, fn) }
    val (r1, r2) = (once(), once())
    // tie-break pass: when the two timings disagree by >2×, one of them
    // was hit by transient load (GC, the OS, a concurrent driver task) —
    // a third measurement stops a single outlier from surviving the min
    // and false-flagging a regression against the baseline. A FAILED
    // tie-break run falls back to the two valid timings it was meant to
    // arbitrate — it must not turn a twice-successful query into -1.
    val results = r1.map { case (k, v) =>
      val best =
        if (v < 0 || r2(k) < 0) -1.0
        else if (math.max(v, r2(k)) > 2.0 * math.min(v, r2(k))) {
          val v3 = time(k, SparkEntry.queries(k))
          if (v3 < 0) math.min(v, r2(k)) else math.min(math.min(v, r2(k)), v3)
        } else math.min(v, r2(k))
      k -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures stay visible as -1 per query but must INFLATE the total,
    // not subtract from it — a broken query shrinking the total could
    // mask a real regression in the driver's 2×-of-baseline comparison
    val total = results.values.map(v => if (v < 0) 600.0 else v).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
