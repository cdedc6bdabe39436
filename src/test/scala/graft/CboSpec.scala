package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Cost-based-optimizer facts pinned in CI (the stats-driven planning
  * complement to AdaptiveSpec's runtime re-planning): with catalog
  * statistics from ANALYZE TABLE and `spark.sql.cbo.enabled`, a
  * SELECTIVE filter on a large dimension is estimated down to
  * broadcast size at PLANNING time — the decision AQE can only make
  * after materializing the shuffle. At 100 TB this is the difference
  * between planning the right join strategy up front and paying one
  * full dimension shuffle to discover it.
  *
  * The negative control runs the SAME query with CBO off: size-only
  * stats propagate the dimension's full size through the filter, so
  * the static plan keeps the sort-merge join. Both assertions read the
  * STATIC plan (AQE disabled inside the test) because AQE's runtime
  * conversion would mask the planner-mode difference. */
class CboSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE column stats + CBO broadcast a selectively-filtered dim; size-only stats do not") {
    val catalog = spark.catalog
    Seq("cbo_fact", "cbo_dim").foreach { t =>
      if (catalog.tableExists(t)) spark.sql(s"DROP TABLE $t")
      // a previously-failed run can leave the managed location behind
      // with no catalog entry — saveAsTable then refuses the name
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    // dim: ~10 MB on disk — the payload must be INCOMPRESSIBLE (sha
    // hex chains), or parquet encodes it under the broadcast threshold
    // and the size-only control broadcasts too — and a 1000-way
    // selective column
    spark.range(0, 50000, 1, 4)
      .select(col("id").as("k"), (col("id") % 1000).as("sel"),
        concat(sha2(col("id").cast("string"), 256),
          sha2(concat(lit("b"), col("id").cast("string")), 256),
          sha2(concat(lit("c"), col("id").cast("string")), 256))
          .as("payload"))
      .write.mode("overwrite").saveAsTable("cbo_dim")
    spark.range(0, 200000, 1, 8)
      .select((col("id") % 50000).as("k"), col("id").as("v"))
      .write.mode("overwrite").saveAsTable("cbo_fact")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")

    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1024 * 1024).toString)
      def staticPlan() = spark.table("cbo_fact")
        .join(spark.table("cbo_dim").filter(col("sel") === 7), "k")
        .queryExecution.sparkPlan
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // ANALYZE row counts reached the optimizer (rowCount is only
      // surfaced by the CBO stats visitor, hence inside this block)
      val rc = spark.table("cbo_dim").queryExecution.optimizedPlan
        .stats.rowCount
      assert(rc.contains(BigInt(50000)), s"catalog rowCount: $rc")
      val cboPlan = staticPlan()
      assert(cboPlan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"CBO static plan must broadcast the filtered dim:\n$cboPlan")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val sizePlan = staticPlan()
      assert(sizePlan.collect { case s: SortMergeJoinExec => s }.nonEmpty &&
        sizePlan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"size-only static plan must keep the sort-merge join:\n$sizePlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      Seq("cbo_fact", "cbo_dim").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
