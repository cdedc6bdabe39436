package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Data-layout story for the 100 TB deployment: a date-partitioned
  * parquet layout (`write.partitionBy("day")`) must let a day-filtered
  * scan prune whole directories at PLANNING time — the difference
  * between reading one day and reading the lake. Complements
  * BucketingSpec (join co-location) with the scan-pruning half of the
  * layout design. */
class PartitionPruneSpec extends SparkSpec {

  test("day-partitioned layout prunes partitions; value filters push down") {
    val dir = Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("day").parquet(dir)

    val someDay = events.select(min(col("day"))).collect().head.getDate(0)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === lit(someDay) && col("value") >= 50.0)

    val scan = pruned.queryExecution.executedPlan.toString()
    // the day predicate must be a PARTITION filter (directory pruning),
    // not a per-row data filter...
    assert(scan.contains("PartitionFilters:") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"),
      s"day filter not in PartitionFilters:\n$scan")
    // ...and the value predicate must reach the parquet reader
    assert(scan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("GreaterThanOrEqual(value,50.0)"),
      s"value filter not pushed:\n$scan")

    // correctness: pruned read ≡ unpartitioned filter
    val expected = events
      .filter(col("day") === lit(someDay) && col("value") >= 50.0).count()
    assert(pruned.count() === expected)

    // the scan reads ONLY the matching day's files (directory layout
    // honored end-to-end, not just advertised in the plan)
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"day=$someDay")),
      s"scan read foreign partitions: ${files.take(3).mkString(", ")}")
  }
}
