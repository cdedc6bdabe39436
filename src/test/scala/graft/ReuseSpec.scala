package graft


import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.PairGraph

/** The mode-selectable materialization primitive (round-6 verdict #2):
  * `local` (executor-pinned checkpoint), `reliable` (checkpoint dir,
  * survives executor loss), `persist` (DISK_ONLY cache). In EVERY mode
  * consumers must share one derivation, and results must be identical.
  */
class ReuseSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](m: String)(f: => A): A = {
    spark.conf.set(Reuse.ModeKey, m)
    try f finally spark.conf.unset(Reuse.ModeKey)
  }

  for (m <- Seq("local", "reliable", "persist")) {
    test(s"mode=$m: materialize is eager and consumers share one derivation") {
      withMode(m) {
        // an accumulator (NOT a captured AtomicInteger — task closures
        // are serialized even in local mode) counts derivation rows
        val n = spark.sparkContext.longAccumulator(s"reuse-derivations-$m")
        val counting = udf { (x: Long) => n.add(1); x }
        val df = spark.range(100).select(counting(col("id")).as("id"))
        val mat = Reuse.materialize(df)
        val after = n.value
        assert(after >= 100, s"materialize must be eager (ran $after rows)")
        // two consumers: no re-derivation beyond the materialization pass
        assert(mat.agg(sum("id")).collect().head.getLong(0) === 4950L)
        assert(mat.filter(col("id") < 10).count() === 10L)
        assert(n.value === after, "consumers re-derived the frame")
      }
    }
  }

  test("mode=reliable writes to the configured checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reuse-ckpt")
    spark.conf.set(Reuse.DirKey, dir.toString)
    try withMode("reliable") {
      val mat = Reuse.materialize(spark.range(10).toDF("id"))
      assert(mat.count() === 10L)
      // RDD checkpoint files landed under the configured dir
      val walked = java.nio.file.Files.walk(dir)
      val n = try walked.count() finally walked.close()
      assert(n > 1, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Reuse.DirKey)
  }

  test("mode=persist caches DISK_ONLY, cuts logical lineage, release frees the cache") {
    withMode("persist") {
      val before = spark.sparkContext.getPersistentRDDs.size
      val mat = Reuse.materialize(spark.range(10).toDF("id"))
      // the cache is real and DISK_ONLY …
      val added = spark.sparkContext.getPersistentRDDs.size - before
      assert(added === 1)
      assert(spark.sparkContext.getPersistentRDDs.values
        .exists(_.getStorageLevel === StorageLevel.DISK_ONLY))
      // … and the returned frame is a LEAF plan (LogicalRDD), so
      // iterative loops stop nesting one AQE/InMemoryRelation layer
      // per round (per-action plan stringification walked that nest
      // exponentially — the r14 persist-mode stall)
      assert(mat.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
        mat.queryExecution.analyzed.nodeName)
      assert(mat.count() === 10L)
      // release unpersists the ORIGINAL cached frame through the
      // wrapped handle
      Reuse.release(mat)
      assert(spark.sparkContext.getPersistentRDDs.size === before)
    }
  }

  test("unknown mode fails loudly") {
    withMode("cloud9") {
      intercept[IllegalArgumentException](
        Reuse.materialize(spark.range(1).toDF("id")))
    }
  }

  test("PairGraph + components pipeline agree across all three modes") {
    // representative consumer stack: jaccard pair graph -> components.
    // Same docs, one run per mode; results must be IDENTICAL (the mode
    // changes durability, never values).
    val docs = Tables.documents(spark, sf)
    def run(m: String): (Set[(Long, Long)], Set[(Long, Long)]) = withMode(m) {
      PairGraph.clear()
      val pairs = PairGraph.of(spark, s"reusespec:$m") {
        operators.Dedup.jaccardNearDupPairs(docs, "doc_id", "text", 3, 0.6)
      }
      val comps = operators.Dedup.nearDupComponents(docs, "doc_id", pairs)
      val out = (
        pairs.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet,
        comps.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      PairGraph.clear()
      out
    }
    val local = run("local")
    assert(local._1.nonEmpty)
    assert(run("reliable") === local)
    assert(run("persist") === local)
  }
}
