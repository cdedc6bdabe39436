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
