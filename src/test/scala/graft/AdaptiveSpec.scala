package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning, pinned as CI fact rather than configuration
  * hope: the skew-join split and small-partition coalescing are the
  * engine-side half of the 100 TB skew story ([[graft.operators.Scale]]'s
  * salting is the declarative half — salting for aggregations, AQE for
  * joins the user didn't salt). */
class AdaptiveSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // one hot key holds ~95% of the left side — the unsalted-join shape
    // that strands a single straggler task at scale
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(0, 200000).select(
        when(col("id") < 190000, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 64).select(col("id").as("k"),
        lit("dim").as("d"))
      val joined = left.join(right, "k")
      // collect() executes THIS QueryExecution (count() would plan its
      // own), so executedPlan below is the final adaptive plan.
      // Only the hot key matches the dim side (190000..199999 ∉ 0..63).
      val n = joined.collect().length
      assert(n === 190000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark and split the hot-key partition:\n$finalPlan")
    }
  }

  test("runtime bloom filter: a selective dim filter prunes the fact side") {
    // the optimizer's InjectRuntimeFilter: a filtered creation side
    // (part, brand-filtered) plants a bloom probe on the application
    // side (lineitem) of a shuffle join — rows that cannot match are
    // dropped before the exchange, the engine-side analogue of
    // Dedup.bloomAntiJoin's explicit bloom. Broadcast is disabled
    // because broadcast joins already prune and get no filter.
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = Tables.lineitem(spark, sf)
      val p = Tables.part(spark, sf).filter(col("p_brand") === "Brand#4")
      val j = l.join(p, col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "p_brand")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"bloom probe must be injected on the lineitem side:\n$plan")
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    withConf(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB") {
      // 32 shuffle partitions of a tiny aggregation → far under advisory
      val agg = spark.range(0, 10000)
        .groupBy((col("id") % 7).as("k")).count()
      agg.collect()
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("coalesced"),
        s"tiny shuffle must be coalesced below 32 partitions:\n$finalPlan")
    }
  }
}
