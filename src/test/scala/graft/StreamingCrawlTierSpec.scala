package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.functions.TextAnalysis
import graft.streaming.Windows

/** The v6 extraction-tier recipe in its OPERATIONAL streaming posture —
  * the crawl-tier job a production corpus refresh runs continuously:
  * file-stream page increments → effectively-once ingress
  * ([[Windows.dedupWithinWatermark]] absorbs at-least-once crawl
  * replays BEFORE the extractor, so replays never pay extraction) →
  * mainContent block classifier → token floor → shipped-artifact
  * classifier gate → append sink with checkpointing.
  *
  * The batch `q_curated_corpus_v6` recipe is the CONTRACT: after a
  * backfill run, a checkpoint restart, and a replayed page, the sink's
  * end-state must equal the batch chain over the distinct pages landed
  * so far — no new oracle needed, batch equivalence is the oracle.
  * (StreamRestartSpec pins the generic restart/late-data semantics;
  * this spec pins the crawl-tier COMPOSITION on top of them. The JDBC
  * exactly-once epoch-ledger sink this job would use in production is
  * executed branch-by-branch in JdbcUpsertExecSpec.)
  */
class StreamingCrawlTierSpec extends SparkSpec {
  import spark.implicits._

  private val pageSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("html", StringType),
    StructField("ts", StringType)))

  /** The wrappedPages shape from the batch v6 query: nav chrome, short
    * heading, the real paragraph (with an inline link), a link-list,
    * footer, script — only the paragraph survives extraction, as
    * "<body> See more here". */
  private def pageHtml(id: Long, body: String): String =
    "<html><head><title>d</title><style>p{color:#888}</style></head>" +
      "<body><div class=\"nav\"><a href=\"/\">Home</a> " +
      "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></div>" +
      s"<h1>Doc $id</h1><p>$body See <a href=\"/m\">more here</a></p>" +
      "<div class=\"rel\"><a href=\"/1\">doc one</a> " +
      "<a href=\"/2\">doc two</a> <a href=\"/3\">doc three</a></div>" +
      "<footer>Copyright 2026 Example</footer>" +
      "<script>if(1<2){x=1;}</script></body></html>"

  private lazy val weightArr: Seq[Long] = {
    val rows = TextAnalysis.classifierFixtureWeights(spark, 512)
      .select(col("bucket").cast("int"), col("w").cast("long")).collect()
    val arr = new Array[Long](512)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr.toSeq
  }

  /** The extraction tier, batch and streaming alike (pure per-row
    * Column ops — no join, so the same plan serves both run modes):
    * mainContent → kept-block + ≥8-token floor → classifier gate. */
  private def extractAndGate(pages: DataFrame): DataFrame =
    TextAnalysis.mainContent(pages, "doc_id", "html")
      .withColumn("__s",
        graft.expressions.ClassifierScore.score(col("main_text"), weightArr))
      .filter(col("n_kept") > 0 &&
        size(split(trim(col("main_text")), "\\s+")) >= 8 &&
        col("__s").isNotNull && col("__s.n_feats") > 0 &&
        col("__s.score_sum") > 0)
      .select(col("doc_id"), col("main_text"), col("n_blocks"),
        col("n_kept"))

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private var fileSeq = 0
  /** One JSON file per landed batch with a strictly increasing mtime
    * (the StreamRestartSpec discipline: FileStreamSource orders by
    * modification time, and back-to-back writes can share a tick). */
  private def landPages(dir: Path, rows: Seq[(Long, String, String)]): Unit = {
    fileSeq += 1
    val staging = Files.createTempDirectory("crawl_stage").toString
    rows.toDF("doc_id", "html", "ts").coalesce(1)
      .write.mode("overwrite").json(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(f => f.getName.endsWith(".json")).head
    val target = dir.resolve(f"batch_$fileSeq%04d.json")
    Files.move(part.toPath, target)
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(
        1700000000000L + fileSeq * 10000L))
  }

  private def runOnce(in: Path, out: Path, cp: Path): Unit = {
    val stream = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", "1")
      .json(in.toString)
      .withColumn("ts", to_timestamp(col("ts")))
    val deduped = Windows.dedupWithinWatermark(stream, Seq("doc_id"), "ts",
      watermark = "1 hour")
    val q = extractAndGate(deduped).writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", cp.toString)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  // bodies chosen offline so the extracted "<body> See more here"
  // scores POSITIVE under the 512-bucket fixture weights (the
  // IncrementalCurationSpec method); negDoc scores strongly negative.
  private val body1 = "xray island cloud mica fern dune briar garnet zebra elm sage jungle"
  private val body2 = "vale maple cloud stone nectar elm thyme jungle island zebra reef river"
  private val body4 = "cloud garnet reef dune zebra grape river mica nectar yarn island xray"
  private val negBody = "echo kite book house queen amber data umbra note apple mount wind"

  test("crawl tier: backfill, checkpoint restart, replayed page ≡ batch recipe") {
    val (in, out, cp) = (tmp("ct_in"), tmp("ct_out"), tmp("ct_cp"))
    val t0 = "2026-08-15 10:00:00"

    // backfill: two good pages, one classifier-negative, one chrome-only
    val batch1 = Seq(
      (1L, pageHtml(1L, body1), t0),
      (2L, pageHtml(2L, body2), t0),
      (3L, pageHtml(3L, negBody), t0),
      (9L, pageHtml(9L, "tiny"), t0)) // paragraph under the token floor
    landPages(in, batch1.take(2))
    landPages(in, batch1.drop(2))
    runOnce(in, out, cp)

    def sinkIds(): Seq[Long] = spark.read.parquet(out.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(sinkIds() === Seq(1L, 2L))

    // a new increment lands WITH a replayed copy of page 2 (the
    // at-least-once crawl): the restart restores dedup state from the
    // checkpoint, so the replay is dropped ACROSS the restart, and
    // already-emitted rows are not re-emitted
    landPages(in, Seq(
      (4L, pageHtml(4L, body4), t0),
      (2L, pageHtml(2L, body2), t0)))
    runOnce(in, out, cp)
    assert(sinkIds() === Seq(1L, 2L, 4L),
      "restart re-emitted rows or the replayed page escaped dedup")

    // end-state ≡ the batch v6 recipe over the DISTINCT pages landed
    val allPages = (batch1 ++ Seq((4L, pageHtml(4L, body4), t0)))
      .toDF("doc_id", "html", "ts")
    val batch = extractAndGate(allPages)
      .select("doc_id", "main_text", "n_blocks", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val streamed = spark.read.parquet(out.toString)
      .select("doc_id", "main_text", "n_blocks", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed === batch)

    // nothing new → a third run emits nothing
    runOnce(in, out, cp)
    assert(sinkIds() === Seq(1L, 2L, 4L))
  }

  test("outlink extraction runs unchanged in an append-mode stream") {
    // extractOutlinks is a stateless projection + explode, so the SAME
    // operator serves the continuous crawl job: pages stream in, link
    // candidates stream out, batch ≡ stream end-state. pageHtml's nav/
    // list/footer anchors are the links under test.
    import graft.functions.UrlOps
    val (in, out, cp) = (tmp("ol_in"), tmp("ol_out"), tmp("ol_cp"))
    val t0 = "2026-08-15 10:00:00"
    val pages = Seq(
      (1L, pageHtml(1L, body1), t0),
      (2L, pageHtml(2L, body2), t0),
      (4L, pageHtml(4L, body4), t0))
    landPages(in, pages.take(2))
    landPages(in, pages.drop(2))
    def withUrl(df: DataFrame): DataFrame = df.withColumn("url",
      concat(lit("https://h.com/d/"), col("doc_id").cast("string"),
        lit("/index.html")))
    val stream = spark.readStream.schema(pageSchema)
      .option("maxFilesPerTrigger", "1").json(in.toString)
    val q = UrlOps.extractOutlinks(withUrl(stream), "url", "html")
      .select("doc_id", "outlink")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", cp.toString)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = UrlOps.extractOutlinks(
        withUrl(pages.toDF("doc_id", "html", "ts")), "url", "html")
      .select("doc_id", "outlink")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    // absolutization really happened: root-relative nav links resolve
    // against each page's own URL
    assert(batch.contains((1L, "https://h.com/a")))
    assert(batch.contains((4L, "https://h.com/m")))
    assert(batch.size === pages.size * 7) // 7 anchors per planted page
  }

  test("streaming frontier ≡ Crawl.bfs per hop, across batches and a checkpoint restart") {
    import graft.streaming.StreamingFrontier
    // hand-checkable corpus: seeds {a,b}; a→{c,d}, b→{d,e}, c→{f,a},
    // d→{g}, f→{h}, g→{h}; e and h have no pages (dangling discoveries)
    def u(s: String) = s"http://s.example.com/$s"
    def page(links: String*): String =
      "<html><body>" +
        links.map(l => s"""<a href="${u(l)}">x</a>""").mkString +
        "</body></html>"
    val corpus = Map(
      "a" -> page("c", "d"), "b" -> page("d", "e"),
      "c" -> page("f", "a"), "d" -> page("g"),
      "f" -> page("h"), "g" -> page("h"))
    val pagesDf = corpus.toSeq.map { case (k, h) => (u(k), h) }
      .toDF("url", "html")
    val seeds = Seq(u("a"), u("b")).toDF("url")
    // the batch contract: first-reach hops over the same corpus
    val bfs = graft.operators.Crawl
      .bfs(pagesDf, "url", "html", seeds, "url", hops = 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    def hop(k: Int): Set[String] =
      bfs.collect { case (url, h) if h == k => url }.toSet
    assert(hop(1) === Set(u("c"), u("d"), u("e")))
    assert(hop(2) === Set(u("f"), u("g")))
    assert(hop(3) === Set(u("h")))

    val (in, out, cp) = (tmp("sf_in"), tmp("sf_out"), tmp("sf_cp"))
    val pageSchema2 = StructType(Seq(
      StructField("url", StringType), StructField("html", StringType)))
    var landed = 0
    def land(names: Seq[String]): Unit = {
      landed += 1
      val staging = Files.createTempDirectory("sf_stage").toString
      names.map(k => (u(k), corpus(k))).toDF("url", "html")
        .coalesce(1).write.mode("overwrite").json(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".json")).head
      val target = in.resolve(f"cap_$landed%04d.json")
      Files.move(part.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + landed * 10000L))
    }
    def runOnceF(): Unit = {
      val stream = spark.readStream.schema(pageSchema2)
        .option("maxFilesPerTrigger", "1").json(in.toString)
      val q = StreamingFrontier.frontierDeltas(stream, "url", "html")
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def sinkUrls(): Set[String] =
      spark.read.parquet(out.toString).collect()
        .map(_.getString(0)).toSet

    // hop-by-hop: land the fetched frontier, read the emitted delta
    land(Seq("a", "b")) // the seeds are batch-one captures
    runOnceF()
    val d1 = sinkUrls()
    assert(d1 === hop(1), "delta after seeds must be the hop-1 frontier")
    land(Seq("c", "d")) // e has no page: discovered, never fetchable
    runOnceF()
    val d2 = sinkUrls() -- d1
    assert(d2 === hop(2))
    // checkpoint restart BEFORE the last hop: the seen registry must
    // survive — a restart that forgot it would re-emit c/d/e/f/g here
    land(Seq("f", "g"))
    runOnceF()
    val d3 = sinkUrls() -- d1 -- d2
    assert(d3 === hop(3))
    // convergence: the accumulated deltas are exactly bfs's discovered
    // set minus the hop-0 seeds; re-landing a page emits nothing new
    assert(sinkUrls() === bfs.keySet -- Set(u("a"), u("b")))
    land(Seq("a"))
    runOnceF()
    assert(sinkUrls() === bfs.keySet -- Set(u("a"), u("b")))
  }

  test("streaming frontier × politeness: per-wave schedule ≡ batch pricing per hop, across a restart") {
    import graft.streaming.StreamingFrontier
    import org.apache.spark.sql.expressions.Window
    // three hosts: fast declares 0.5 s (the * group), slow 2 s (the
    // graftbot group), nd declares nothing → the 1 s default
    def uf(s: String) = s"http://fast.example.com/$s"
    def us(s: String) = s"http://slow.example.com/$s"
    def un(s: String) = s"http://nd.example.com/$s"
    val delays = graft.functions.UrlOps.robotsCrawlDelays(
      Seq(
        ("fast.example.com", "User-agent: *\nCrawl-delay: 0.5"),
        ("slow.example.com", "User-agent: graftbot\nCrawl-delay: 2"))
        .toDF("host", "text"),
      "host", "text", "graftbot")
    def page(links: String*): String =
      "<html><body>" +
        links.map(l => s"""<a href="$l">x</a>""").mkString +
        "</body></html>"
    // seeds a@fast, b@slow; hop-1 = {c@fast, f@fast, d@slow, e@nd};
    // hop-2 = {g@fast, i@fast, h@slow} (g linked twice — emits once)
    val corpus = Map(
      uf("a") -> page(uf("c"), us("d"), un("e")),
      us("b") -> page(us("d"), uf("f")),
      uf("c") -> page(uf("g")),
      us("d") -> page(us("h"), uf("i")),
      uf("f") -> page(uf("g")))
    // the batch pricing contract, applied to ONE hop's frontier: per
    // host, (sha52(url) rank − 1) × delay — the q_fetch_schedule rule
    // on the url identity
    def priceHop(urls: Set[String]): Set[(String, String, Long)] = {
      val w = Window.partitionBy("host")
        .orderBy(graft.functions.Kmv.sha52(col("url")), col("url"))
      urls.toSeq.toDF("url")
        .withColumn("host", graft.functions.UrlOps.hostNoPort(col("url")))
        .join(broadcast(delays), Seq("host"), "left")
        .withColumn("__r", row_number().over(w))
        .select(col("url"), col("host"),
          ((col("__r") - 1) * coalesce(col("crawl_delay_s"), lit(1.0))
            * 1000).cast("long").as("fetch_offset_ms"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2))).toSet
    }
    val hop1 = Set(uf("c"), uf("f"), us("d"), un("e"))
    val hop2 = Set(uf("g"), uf("i"), us("h"))

    val (in, out, cp) = (tmp("sp_in"), tmp("sp_out"), tmp("sp_cp"))
    val pageSchema2 = StructType(Seq(
      StructField("url", StringType), StructField("html", StringType)))
    var landed = 0
    def land(urls: Seq[String]): Unit = {
      landed += 1
      val staging = Files.createTempDirectory("sp_stage").toString
      urls.map(k => (k, corpus(k))).toDF("url", "html")
        .coalesce(1).write.mode("overwrite").json(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.move(part.toPath, in.resolve(f"cap_$landed%04d.json"))
    }
    def runOnceS(): Unit = {
      val stream = spark.readStream.schema(pageSchema2)
        .option("maxFilesPerTrigger", "1").json(in.toString)
      val q = StreamingFrontier
        .scheduledDeltas(stream, "url", "html", delays)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def waves(): Set[(String, String, Long)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    land(Seq(uf("a"), us("b"))) // the seed wave
    runOnceS()
    val w1 = waves()
    assert(w1 === priceHop(hop1),
      "wave 1 must be the batch-priced hop-1 schedule")
    // offsets are really politeness-priced: the two fast-host urls sit
    // 500 ms apart, the single urls of slow/nd start at 0
    assert(w1.filter(_._2 == "fast.example.com").map(_._3) === Set(0L, 500L))
    assert(w1.filter(_._2 == "slow.example.com").map(_._3) === Set(0L))
    // checkpoint restart between waves: the seen registry survives, so
    // wave 2 prices ONLY the new discoveries (g once despite 2 links)
    land(Seq(uf("c"), us("d"), uf("f")))
    runOnceS()
    assert(waves() -- w1 === priceHop(hop2))
    // re-landing fetched pages discovers nothing: no third wave
    land(Seq(uf("a"), uf("c")))
    runOnceS()
    assert(waves() -- w1 === priceHop(hop2))
  }
}
