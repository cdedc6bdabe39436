package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Stateful
import graft.streaming.Stateful.Keyed

/** flatMapGroupsWithState custom keyed state: the in-stream upsert
  * materializer. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey emits only records that advance a key's event time") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Keyed[String]]
    val out = Stateful.latestPerKey(input.toDS())

    val q = out.writeStream.format("memory").queryName("latest_state")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Keyed("a", 100L, "a-v1"),
        Keyed("a", 300L, "a-v3"), // same batch, later ts wins
        Keyed("b", 100L, "b-v1"))
      q.processAllAvailable()
      input.addData(
        Keyed("a", 200L, "a-v2-stale"), // older than state -> suppressed
        Keyed("b", 150L, "b-v2"))       // advances -> emitted
      q.processAllAvailable()

      val emitted = spark.table("latest_state").as[String].collect().sorted
      assert(emitted === Array("a-v3", "b-v1", "b-v2"))
    } finally q.stop()
  }

  test("per-batch folding emits one winner per key per batch") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Keyed[String]]
    val out = Stateful.latestPerKey(input.toDS())
    val q = out.writeStream.format("memory").queryName("latest_fold")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1 to 10).map(i => Keyed("k", i.toLong, s"v$i")): _*)
      q.processAllAvailable()
      val emitted = spark.table("latest_fold").as[String].collect()
      assert(emitted.toSeq === Seq("v10")) // not 10 emissions
    } finally q.stop()
  }
}
