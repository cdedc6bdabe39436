package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming crawl-frontier maintenance — the continuous analog of
  * [[graft.operators.Crawl.bfs]]: fetched pages arrive as a stream,
  * outlinks extract per micro-batch (scan-local, the batch
  * [[graft.functions.UrlOps.extractOutlinks]] plan unchanged), the
  * SEEN set lives in keyed state on the url, and the output is the
  * frontier DELTA — urls discovered for the first time, i.e. exactly
  * what the fetcher should enqueue next. The crawl loop closes
  * OUTSIDE the job: the fetcher fetches emitted urls and their
  * captures come back through the same stream.
  *
  * Discovery semantics match the batch BFS:
  *   - a capture's own url is marked seen WITHOUT an emission (an
  *     honest fetcher only fetches previously-discovered urls; seeds
  *     enter as batch-one captures and are hop-0 by definition);
  *   - an outlink emits iff its url was never seen — once, no matter
  *     how many pages across how many batches link it;
  *   - a url captured and linked in the SAME batch is a seed being
  *     referenced by a sibling seed: marked seen, not emitted (bfs
  *     puts it at hop 0, never in a frontier).
  * Feeding the corpus hop-by-hop therefore reproduces `Crawl.bfs`'s
  * per-hop frontiers exactly — the convergence theorem
  * StreamingCrawlTierSpec pins.
  *
  * Scale shape: one shuffle on the url key per micro-batch (the same
  * key the batch anti-join shuffles on); state is one boolean per
  * discovered url — a url REGISTRY, right for the RocksDB store up to
  * ~10⁹ urls, the same bound as the batch seen-set anti-join. Beyond
  * that, swap exact state for the standing-bloom pattern
  * ([[graft.operators.Dedup.bloomAntiJoin]]) at the cost of
  * occasionally never enqueueing a false-positive "seen" url. */
object StreamingFrontier {

  final case class UrlEvent(url: String, is_capture: Boolean)
  final case class Discovery(url: String)

  final case class ScheduledFetch(url: String, host: String,
      fetch_offset_ms: Long)

  /** [[frontierDeltas]] composed with the politeness tier INSIDE the
    * micro-batch: each batch's newly-discovered urls come out as a
    * priced fetch wave — `(url, host, fetch_offset_ms)` with offsets
    * `(position − 1) × crawl_delay` within each host, positions in
    * sha52(url) order (the batch `q_fetch_schedule` pricing rule, on
    * the url identity a stream naturally has). `delays` is the parsed
    * robots registry ([[graft.functions.UrlOps.robotsCrawlDelays]]:
    * host, crawl_delay_s) joined stream-static and broadcastable;
    * hosts without a declared delay default to 1 s, exactly like the
    * batch schedule.
    *
    * Each micro-batch is its own fetch WAVE (offsets restart at 0 per
    * batch): the fetcher executes a wave, the captures come back
    * through the stream, the next wave prices the next hop — so
    * feeding a corpus hop-by-hop reproduces the batch per-hop schedule
    * exactly (spec'd, including across a checkpoint restart). Scale
    * shape: the discovery pass's url-keyed shuffle plus one host-keyed
    * shuffle of the DELTA (new urls only — registry-sized, not
    * corpus-sized); the wave grouper writes no state. */
  def scheduledDeltas(pages: DataFrame, urlCol: String, htmlCol: String,
      delays: DataFrame): Dataset[ScheduledFetch] = {
    implicit val rowEnc: Encoder[(String, String, Double, Long)] =
      Encoders.product[(String, String, Double, Long)]
    implicit val outEnc: Encoder[ScheduledFetch] =
      Encoders.product[ScheduledFetch]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    frontierDeltas(pages, urlCol, htmlCol).toDF()
      .withColumn("host", graft.functions.UrlOps.hostNoPort(col("url")))
      .join(broadcast(delays.select(col("host"),
        col("crawl_delay_s").cast("double").as("__delay"))),
        Seq("host"), "left")
      .select(col("url"), col("host"),
        coalesce(col("__delay"), lit(1.0)).as("__d"),
        graft.functions.Kmv.sha52(col("url")).as("__h"))
      .as[(String, String, Double, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, ScheduledFetch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[(String, String, Double, Long)],
            _state: GroupState[Boolean]) =>
          // per-batch grouping only — state is never written, so the
          // operator carries nothing across waves
          rows.toSeq.sortBy(r => (r._4, r._1)).iterator.zipWithIndex
            .map { case (r, i) =>
              ScheduledFetch(r._1, host, (i * r._3 * 1000.0).toLong)
            }
      }
  }

  /** Frontier deltas from a stream of fetched pages `(urlCol,
    * htmlCol)`. flatMapGroupsWithState declares Append — pair with an
    * append sink; each emitted row is a url seen for the first time. */
  def frontierDeltas(pages: DataFrame, urlCol: String,
      htmlCol: String): Dataset[Discovery] = {
    implicit val evEnc: Encoder[UrlEvent] = Encoders.product[UrlEvent]
    implicit val disEnc: Encoder[Discovery] = Encoders.product[Discovery]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val captures = pages
      .select(col(urlCol).cast("string").as("url"),
        lit(true).as("is_capture"))
    val links = graft.functions.UrlOps
      .extractOutlinks(pages, urlCol, htmlCol)
      .select(col("outlink").cast("string").as("url"),
        lit(false).as("is_capture"))
    captures.unionByName(links).as[UrlEvent]
      .filter(_.url != null)
      .groupByKey(_.url)
      .flatMapGroupsWithState[Boolean, Discovery](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (url: String, rows: Iterator[UrlEvent], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val captured = rows.exists(_.is_capture)
            state.update(true)
            if (captured) Iterator.empty else Iterator(Discovery(url))
          }
      }
  }
}
