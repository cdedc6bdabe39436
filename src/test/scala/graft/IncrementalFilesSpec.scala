package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.IncrementalFiles

/** Batch-incremental ingestion contract: new files only, metadata
  * files excluded, deterministic capped draining, empty increments
  * loud-by-type (None, not an unreadable empty frame). */
class IncrementalFilesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyManifest = Seq.empty[String].toDF("path")

  test("first run sees everything; second run sees only the new batch") {
    val dir = Files.createTempDirectory("inc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2).write.mode("append").parquet(dir)
    val first = IncrementalFiles.readNewParquet(spark, dir, emptyManifest)
    assert(first.isDefined)
    val (d1, m1) = first.get
    assert(d1.count() === 2L)
    assert(m1.count() >= 2L) // one file per partition + driver listing
    // _SUCCESS written by the commit protocol is never a data file
    assert(!m1.collect().exists(_.getString(0).contains("_SUCCESS")))
    // commit the manifest, land a second batch
    val manifest = m1.select("path")
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(dir)
    val second = IncrementalFiles.readNewParquet(spark, dir, manifest)
    assert(second.isDefined)
    val (d2, m2) = second.get
    assert(d2.select("id").collect().map(_.getLong(0)).toSet === Set(3L))
    // new manifest rows are disjoint from the committed ones
    val committed = manifest.collect().map(_.getString(0)).toSet
    assert(m2.collect().forall(r => !committed(r.getString(0))))
    // nothing new → None, not an empty/unreadable frame
    val all = manifest.unionByName(m2.select("path"))
    assert(IncrementalFiles.readNewParquet(spark, dir, all).isEmpty)
  }

  test("maxFiles drains a backlog deterministically across capped runs") {
    val dir = Files.createTempDirectory("inc2").toString
    (1 to 5).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    var manifest = emptyManifest
    var seen = Set.empty[Long]
    var rounds = 0
    var done = false
    while (!done && rounds < 10) {
      IncrementalFiles.readNewParquet(spark, dir, manifest, maxFiles = 2) match {
        case None => done = true
        case Some((d, m)) =>
          val ids = d.select("id").collect().map(_.getLong(0)).toSet
          assert(ids.intersect(seen).isEmpty, "a file was re-processed")
          seen ++= ids
          assert(m.count() <= 2L)
          manifest = manifest.unionByName(m.select("path"))
      }
      rounds += 1
    }
    assert(seen === (1 to 5).map(_.toLong).toSet)
    assert(rounds <= 4, s"5 files at cap 2 must drain in 3 rounds + None, took $rounds")
    // manifest column contract is loud
    intercept[IllegalArgumentException](
      IncrementalFiles.newFiles(spark, dir, Seq("x").toDF("not_path")))
  }

  test("the DEFAULT increment is capped — a first backfill cannot land an unbounded driver list") {
    // the no-maxFiles call path must go through a FINITE cap (the
    // maxFilesPerTrigger analog), not Int.MaxValue: a multi-million-
    // file lake's first backfill otherwise lands the whole listing on
    // the driver and in one plan
    assert(IncrementalFiles.DefaultMaxFiles === 100000)
    val dir = Files.createTempDirectory("inc3").toString
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    // default-cap call works end to end for the common (small) case
    val Some((d, m)) = IncrementalFiles.readNewParquet(spark, dir,
      emptyManifest)
    assert(d.count() === 1L && m.count() >= 1L)
  }
}
