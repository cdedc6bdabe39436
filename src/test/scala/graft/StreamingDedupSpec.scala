package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // long enough that a one-word change keeps trigram J ≈ 0.77 — solidly
  // above the 0.5 threshold and the 16×4 banding detection curve
  private val base = "the quick brown fox jumps over the lazy dog again and " +
    "again today while the sun shines bright over the quiet green valley below"

  test("near-dups are detected across micro-batches; distinct docs are not") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Doc]
    val pairs = StreamingDedup.candidatePairs(input.toDS(), threshold = 0.5)

    val q = pairs.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Doc(1L, base),
        Doc(2L, "completely different words about spark engines and queries here now"))
      q.processAllAvailable()
      // cross-batch: 3 is an exact dup of 1, 4 a near-dup (one word off)
      input.addData(
        Doc(3L, base),
        Doc(4L, base.replace("dog", "cat")))
      q.processAllAvailable()

      val found = spark.table("stream_dedup")
        .select("id_a", "id_b", "est_jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(found.contains((1L, 3L)))
      assert(found((1L, 3L)) === 1.0) // exact dup: all components agree
      assert(found.contains((1L, 4L)))
      assert(found.contains((3L, 4L)))
      assert(!found.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    } finally q.stop()
  }

  test("signature estimator tracks true jaccard on known sets") {
    val a = StreamingDedup.shingles(base, 3)
    val b = StreamingDedup.shingles(base.replace("dog", "cat"), 3)
    val trueJ = (a intersect b).size.toDouble / (a union b).size
    val sa = StreamingDedup.signature(a, 256)
    val sb = StreamingDedup.signature(b, 256)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("replayed ids do not re-pair (idempotent per bucket)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Doc]
    val pairs = StreamingDedup.candidatePairs(input.toDS(), threshold = 0.5)
    val q = pairs.writeStream.format("memory").queryName("stream_dedup_replay")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Doc(1L, base), Doc(2L, base))
      q.processAllAvailable()
      input.addData(Doc(1L, base)) // replay of an already-seen id
      q.processAllAvailable()
      val rows = spark.table("stream_dedup_replay")
        .select("id_a", "id_b").distinct().collect()
      assert(rows.length === 1) // only the (1,2) pair, no self/dup pairs
    } finally q.stop()
  }
}
