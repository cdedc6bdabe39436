package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ParquetLayout

/** Scan-level pruning beyond PartitionPruneSpec/BucketingSpec: write-
  * time split-block bloom filters (row-group skipping for point
  * lookups where min/max stats are useless) and DSv2 parquet AGGREGATE
  * pushdown (footer-only MIN/MAX/COUNT). Both assert the pruning in
  * executed-plan evidence AND result equality against the unpruned
  * computation. */
class ParquetPushdownSpec extends SparkSpec {
  import spark.implicits._

  /** Shuffled high-cardinality ids: every row group's min/max spans
    * ~the whole id range, so STAT pruning keeps everything — any
    * observed skipping is the bloom's. */
  private def shuffledIds(n: Int): DataFrame =
    spark.range(n.toLong).select(
      ((col("id") * 2654435761L) % 1000000007L).as("k"),
      col("id").as("v"))

  test("bloom filters skip row groups on point lookups where stats cannot") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val n = 200000
    val df = shuffledIds(n).repartition(1)
    ParquetLayout.writeWithBlooms(df, s"$dir/bloomed",
      ndvByCol = Map("k" -> n.toLong), rowGroupBytes = 64 * 1024)

    // row-group-skipping evidence straight from the written file: per
    // group, its min/max stats vs its bloom's verdict for a probe key
    val f = new java.io.File(s"$dir/bloomed").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
    val present = ((12345L * 2654435761L) % 1000000007L)
    val absent = 1000000008L // above the modulus: provably not a key
    try {
      val blocks = reader.getFooter.getBlocks
      assert(blocks.size() >= 8, s"want many small row groups, got ${blocks.size()}")
      var statKeep = 0
      var bloomKeepAbsent = 0
      var bloomKeepPresent = 0
      (0 until blocks.size()).foreach { b =>
        val block = blocks.get(b)
        val kCol = (0 until block.getColumns.size()).map(block.getColumns.get)
          .find(_.getPath.toDotString == "k").get
        assert(kCol.getBloomFilterOffset >= 0, "bloom missing from footer")
        val stats = kCol.getStatistics
          .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        // shuffled ids: min/max cannot exclude an in-range probe
        if (present >= stats.getMin && present <= stats.getMax) statKeep += 1
        val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(kCol)
        if (bloom.findHash(bloom.hash(absent))) bloomKeepAbsent += 1
        if (bloom.findHash(bloom.hash(present))) bloomKeepPresent += 1
      }
      // stats keep EVERY group (the layout is adversarial to min/max)…
      assert(statKeep === blocks.size(), "expected stat pruning to be useless here")
      // …the bloom keeps the true group and drops ~all groups for a
      // missing key (1% fpp at declared ndv — allow a loose bound)
      assert(bloomKeepPresent >= 1)
      assert(bloomKeepAbsent <= blocks.size() / 4,
        s"bloom kept $bloomKeepAbsent of ${blocks.size()} groups for an absent key")
    } finally reader.close()

    // and the engine answer over the bloomed layout is exact
    val got = spark.read.parquet(s"$dir/bloomed")
      .filter(col("k") === present).collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(12345L))
    assert(spark.read.parquet(s"$dir/bloomed")
      .filter(col("k") === absent).isEmpty)
  }

  test("DSv2 aggregate pushdown: MIN/MAX/COUNT answered from footers, values unchanged") {
    val dir = Files.createTempDirectory("graft-aggpush").toString
    shuffledIds(50000).write.parquet(s"$dir/t")
    val exact = spark.read.parquet(s"$dir/t")
      .agg(min("k"), max("k"), count(lit(1))).collect().head
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList", "parquet")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val pushed = spark.read.parquet(s"$dir/t")
        .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      val plan = pushed.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(plan.contains("PushedAggregation"), s"no pushed aggregation:\n$plan")
      assert(plan.contains("MIN(k)") && plan.contains("MAX(k)") &&
        plan.contains("COUNT(*)"), s"wrong pushed set:\n$plan")
      val got = pushed.collect().head
      assert(got.getLong(0) === exact.getLong(0))
      assert(got.getLong(1) === exact.getLong(1))
      assert(got.getLong(2) === exact.getLong(2))
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }

  test("aggregate pushdown disengages under filters (correctness guard)") {
    val dir = Files.createTempDirectory("graft-aggpush2").toString
    shuffledIds(20000).write.parquet(s"$dir/t")
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList", "parquet")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      // a row-level predicate cannot be answered from footers — the
      // plan must fall back to a real scan, with the right answer
      val filtered = spark.read.parquet(s"$dir/t")
        .filter(col("v") % 2 === 0).agg(count(lit(1)))
      val plan = filtered.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(!plan.contains("PushedAggregation: [COUNT"), plan)
      assert(filtered.collect().head.getLong(0) === 10000L)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }

  test("compact: small-files directory rewritten to the computed file count, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // 64 tiny files (one per partition)
    spark.range(0, 100000, 1, 64)
      .select(col("id"), sha2(col("id").cast("string"), 256).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/in")
    val inFiles = new java.io.File(s"$dir/in").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(inFiles === 64)
    val inBytes = new java.io.File(s"$dir/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = math.max(1024L * 1024, inBytes / 3) // expect ~3 files
    val (nIn, bytes, nOut) = graft.sources.ParquetLayout.compact(
      spark, s"$dir/in", s"$dir/out", target)
    assert(nIn === 64 && bytes === inBytes)
    assert(nOut === ((inBytes + target - 1) / target).toInt)
    val outFiles = new java.io.File(s"$dir/out").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(outFiles === nOut, s"expected $nOut output files, got $outFiles")
    assert(outFiles < 8, s"compaction must actually shrink: $outFiles")
    // contents preserved exactly (count + full checksum)
    val chk = (p: String) => spark.read.parquet(p)
      .agg(count(lit(1)), sum(col("id")),
        expr("bit_xor(xxhash64(id, payload))")).collect().head
    assert(chk(s"$dir/in") === chk(s"$dir/out"))
    // in-place compaction would delete the input under the lazy read —
    // refused loudly
    intercept[IllegalArgumentException] {
      graft.sources.ParquetLayout.compact(spark, s"$dir/in", s"$dir/in",
        target)
    }
    // partitioned layouts keep files BELOW the top level: the
    // recursive listing must count them (a top-level-only count would
    // plan from zero bytes)
    spark.range(0, 1000).select(col("id"), (col("id") % 4).as("part"))
      .write.partitionBy("part").mode("overwrite").parquet(s"$dir/pin")
    val (pn, pb, pOut) = graft.sources.ParquetLayout.compact(
      spark, s"$dir/pin", s"$dir/pout", 1024L * 1024)
    assert(pn >= 4 && pb > 0 && pOut === 1, s"($pn, $pb, $pOut)")
    assert(spark.read.parquet(s"$dir/pout").count() === 1000L)
  }
}
