package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** The in-flight decontamination gate: `Dedup.ngramContaminationInline`
  * is a pure per-row projection against a plan-time bloom of the
  * benchmark's shingles, so the SAME plan adjudicated against the
  * exact join-form in batch also runs inside an append-mode stream
  * with no watermark — benchmark text is dropped before it lands.
  *
  * Contracts pinned here:
  *  (a) one-sided error vs the exact [[Dedup.ngramContamination]]
  *      (inline shared count ≥ exact for every doc — a bloom has no
  *      false negatives);
  *  (b) gate agreement on a margin fixture (dirty docs ≥ 0.5
  *      contamination, clean ≈ 0 + fpp noise, threshold 0.25 between);
  *  (c) the streaming end-state equals the batch gate over the same
  *      docs, including shingle-free docs (which the inline form
  *      deliberately emits with contamination 0.0).
  */
class StreamingDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val probes = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten").toDF("text")

  // dirty docs embed a probe verbatim (contamination well above 0.5);
  // clean docs share no vocabulary with the probes
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail1 tail2"),
    (2L, "prefix one two three four five six seven eight nine ten"),
    (3L, "maple kelp fern thyme garnet mica river piano sage yarn xray briar"),
    (4L, "piano jungle xray ocean island kelp grape briar stone yarn zebra mist"),
    (5L, "ab")) // single token: shingle-free at n=3

  test("inline bloom gate: one-sided vs exact, gate-equal on margin fixture") {
    val df = docs.toDF("doc_id", "text")
    val exact = Dedup.ngramContamination(df, "doc_id", "text",
        probes, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val inline = Dedup.ngramContaminationInline(df, "doc_id", "text",
        probes, "text", n = 3, expectedProbeShingles = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // shingle-free doc 5 is emitted by the inline form only
    assert(inline.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(!exact.contains(5L))
    inline.filter(_._1 != 5L).foreach { case (id, sharedInline, c) =>
      assert(c + 1e-12 >= exact(id),
        s"doc $id: inline $c under-reports exact ${exact(id)}")
    }
    assert(inline.find(_._1 == 5L).get._3 === 0.0)
    // the margin gate agrees with the exact gate
    val keptExact = Dedup.dropContaminated(df, "doc_id", "text",
        probes, "text", n = 3, maxContamination = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptInline = Dedup.ngramContaminationInline(df, "doc_id", "text",
        probes, "text", n = 3, expectedProbeShingles = 64)
      .filter(col("contamination") <= 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptExact === Set(3L, 4L, 5L))
    assert(keptInline === keptExact)
  }

  test("NULL text folds into the shingle-free contract, not size(null)=-1") {
    val df = (docs :+ (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val row = Dedup.ngramContaminationInline(df, "doc_id", "text",
        probes, "text", n = 3, expectedProbeShingles = 64)
      .filter(col("doc_id") === 6L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // a -1 here would let a NULL-text row silently pass a
    // contamination<=x gate with a nonsense count
    assert(row.toSeq === Seq((0, 0L, 0.0)))
  }

  test("the same gate runs in an append-mode stream with no watermark") {
    val in = Files.createTempDirectory("decontam_in")
    val out = Files.createTempDirectory("decontam_out")
    val cp = Files.createTempDirectory("decontam_cp")
    Seq(in, out, cp).foreach(_.toFile.deleteOnExit())
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").json(in.toString)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).json(in.toString)
    val q = Dedup.ngramContaminationInline(stream, "doc_id", "text",
        probes, "text", n = 3, expectedProbeShingles = 64)
      .filter(col("contamination") <= 0.25)
      .writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", cp.toString)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === Set(3L, 4L, 5L),
      "streamed gate end-state differs from the batch gate")
  }
}
