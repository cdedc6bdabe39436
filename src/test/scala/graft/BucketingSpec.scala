package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: two tables bucketed on the join key
  * join WITHOUT a runtime exchange — the write-time shuffle is amortized
  * across every subsequent join/aggregation on that key. This is the
  * co-located-join story for repeated 100 TB fact-to-fact joins, where a
  * per-query shuffle would dominate the runtime.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no exchange") {
    val catalog = spark.catalog
    Seq("b_orders", "b_customer").foreach { t =>
      if (catalog.tableExists(t)) spark.sql(s"DROP TABLE $t")
    }
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice")).as("revenue"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join itself needs no exchange: bucketed scans already satisfy
      // the required clustering on both sides, so the ONLY shuffle in the
      // plan is the groupBy's (on c_mktsegment) — never on the join keys
      assert(!plan.contains("hashpartitioning(o_custkey"),
        s"unexpected join-key exchange:\n$plan")
      assert(!plan.contains("hashpartitioning(c_custkey"),
        s"unexpected join-key exchange:\n$plan")

      // correctness unchanged vs the unbucketed join
      val unbucketed = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice")).as("revenue"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bucketed.keySet === unbucketed.keySet)
      bucketed.foreach { case (k, v) =>
        assert(math.abs(v - unbucketed(k)) < 1e-6 * math.abs(v))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("b_orders", "b_customer").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
