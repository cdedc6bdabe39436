package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-time parquet layout knobs that turn scan-side pruning on for
  * the READ path the rest of the engine already exploits
  * (PushedFilters / partition pruning / bucketing):
  *
  *  - split-block BLOOM FILTERS per column
  *    (`parquet.bloom.filter.enabled#col`): row-group skipping for
  *    POINT lookups on high-cardinality, unsorted columns — exactly
  *    where min/max statistics are useless (every shuffled row group
  *    spans the full id range, so stat pruning keeps everything; the
  *    bloom rejects absent values per group with ~1% fpp at the
  *    declared ndv). The 100 TB read that motivates it: "fetch these
  *    50 doc_ids from a 10⁹-row corpus" touching only the row groups
  *    that can contain them.
  *  - row-group size (`parquet.block.size`): the skipping granularity
  *    — smaller groups skip more precisely at a small metadata cost.
  *
  * Z-ordered / range-partitioned layouts ([[graft.functions.ZOrder
  * .zorderLayout]]) remain the RANGE-predicate complement; blooms are
  * the equality complement. Aggregate pushdown
  * (`spark.sql.parquet.aggregatePushdown`, DSv2 scans) is the third
  * scan-side lever — exercised in ParquetPushdownSpec; the registered
  * read path stays DSv1, whose PushedFilters guards the plan specs
  * assert.
  */
object ParquetLayout {

  /** Writer options enabling split-block blooms for `ndvByCol`
    * (column → expected distinct values; ndv sizes the filter — a
    * too-small declaration inflates fpp, a huge one wastes footer
    * bytes). */
  def bloomOptions(ndvByCol: Map[String, Long]): Map[String, String] =
    ndvByCol.flatMap { case (c, ndv) =>
      require(ndv > 0, s"ndv for $c must be positive, got $ndv")
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
    }

  /** Write `df` as parquet with blooms on `ndvByCol` and row groups of
    * `rowGroupBytes` (default parquet's 128 MB; smaller = finer
    * skipping). */
  def writeWithBlooms(df: DataFrame, path: String,
      ndvByCol: Map[String, Long],
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    require(rowGroupBytes >= 64 * 1024,
      s"rowGroupBytes $rowGroupBytes below parquet's sane minimum")
    df.write
      .options(bloomOptions(ndvByCol))
      .option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite")
      .parquet(path)
  }

  /** Compact a small-files parquet directory into ~`targetBytes` files —
    * the operational fix for the scan-killer a long-running incremental
    * pipeline accretes (every micro-batch/task writes its own file;
    * 10⁶ 100 KB files cost 10⁶ opens + footer reads and starve the
    * scheduler with single-row-group splits). File count is computed
    * from the INPUT's on-disk bytes (compressed size is the only
    * reliable estimator for its own re-write), then one round-robin
    * repartition → write. Returns (input files, input bytes, output
    * files).
    *
    * Deliberately NOT coalesce(): coalesce would chain input partitions
    * without a shuffle, keeping any input skew; compaction is a
    * once-per-era maintenance pass whose single shuffle buys evenly
    * sized output. Sort/cluster the data first (zorderLayout,
    * repartitionByRange) if scan locality matters — compact preserves
    * rows, not order. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): (Int, Long, Int) = {
    require(targetBytes >= 1024 * 1024,
      s"targetBytes $targetBytes below any sane parquet file size")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite-into-the-source would delete the files the (lazy) read
    // plan resolves at execution — refuse, don't destroy. Nesting is
    // just as fatal: out under in writes into the tree the read is
    // still resolving (and future reads of in double-count); in under
    // out gets deleted by the overwrite. Refuse any ancestry.
    val inQ = fs.makeQualified(p)
    val outQ = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    def pfx(x: org.apache.hadoop.fs.Path) = x.toUri.getPath.stripSuffix("/") + "/"
    require(inQ != outQ && !pfx(outQ).startsWith(pfx(inQ)) &&
        !pfx(inQ).startsWith(pfx(outQ)),
      s"compact input ($inQ) and output ($outQ) must be disjoint " +
        "directories (neither equal nor nested); use a fresh dir + rename")
    // RECURSIVE listing: partitioned layouts (day=*/part-*.parquet)
    // keep their files below the top level, and a top-level-only count
    // would plan nOut from zero bytes while the read still ingests
    // everything
    val it = fs.listFiles(p, true)
    var nFiles = 0
    var totalBytes = 0L
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_")) {
        nFiles += 1; totalBytes += s.getLen
      }
    }
    require(nFiles > 0, s"no parquet data files found under $inPath")
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .min(Int.MaxValue).toInt
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (nFiles, totalBytes, nOut)
  }
}
