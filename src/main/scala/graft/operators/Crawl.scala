package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Reuse.ReuseOps
import graft.functions.UrlOps

/** The crawl loop actually LOOPING: multi-hop breadth-first frontier
  * expansion over a fetched-page corpus — fetch the frontier, extract
  * and absolutize its outlinks ([[UrlOps.extractOutlinks]]), drop
  * everything already seen, and the remainder is the next hop's
  * frontier. The batch form of the discover half of a crawler;
  * compose the robots gate / politeness quota / fetch schedule
  * ([[graft.SparkEntry]]'s frontier chain) on each hop's output in
  * production.
  */
object Crawl {

  /** Fixed-hop BFS (the [[Analytics.pageRank]] fixed-iteration
    * discipline — bounded hops, a [[graft.Reuse]] cut per hop so
    * iterative lineage never grows AND the deployment's reuse mode
    * governs durability: a 1000-executor run selecting `reliable`
    * keeps the seen set recoverable after executor loss instead of
    * pinned to the executors that computed it): returns (url, hop)
    * with `hop` = the FIRST
    * hop each URL was reached at (0 = seed). A seed or link without a
    * matching page row is still reported (it was discovered) — it
    * just fetches nothing, so it contributes no further links.
    *
    * Scale shape per hop: one semi join of pages against the frontier
    * (AQE broadcasts small frontiers), scan-local link extraction
    * (payloads never shuffle), one distinct + one anti-join on the
    * url key against the accumulated seen set. The exact anti-join is
    * right up to ~10⁹ seen URLs; beyond that swap the seen set for
    * [[Dedup.bloomAntiJoin]] (the adjudicated approximate path) at the
    * cost of occasionally re-fetching a false-positive "seen" URL.
    * Early exit on a drained frontier (web components are finite). */
  def bfs(pages: DataFrame, urlCol: String, htmlCol: String,
      seeds: DataFrame, seedUrlCol: String, hops: Int): DataFrame = {
    require(hops >= 0, s"hops must be >= 0, got $hops")
    var seen = seeds.select(col(seedUrlCol).cast("string").as("url"))
      .distinct
      .withColumn("hop", lit(0)).materialized
    var frontier = seen
    var h = 1
    while (h <= hops && !frontier.isEmpty) {
      val fetched = pages.join(
        frontier.select(col("url").as("__f")),
        pages(urlCol) === col("__f"), "left_semi")
      val links = UrlOps.extractOutlinks(fetched, urlCol, htmlCol)
        .select(col("outlink").as("url")).distinct
      val prevFrontier = frontier
      val prevSeen = seen
      frontier = links.join(seen.select("url"), Seq("url"), "left_anti")
        .withColumn("hop", lit(h)).materialized
      seen = seen.unionByName(frontier).materialized
      // superseded round state: reclaim eagerly in persist mode (the
      // Reuse loop discipline — no-op in local/reliable)
      prevSeen.released()
      if (prevFrontier ne prevSeen) prevFrontier.released()
      h += 1
    }
    if (frontier ne seen) frontier.released()
    seen
  }

  /** Nightly host-graph maintenance — the rank analog of the standing
    * dedup registry's `mergeComponents`: fold a crawl increment's new
    * edges into the standing undirected edge set (set union, the EXACT
    * merge). Rank itself is not exactly incrementally maintainable
    * (one new edge perturbs every score), so the consumer re-runs the
    * fixed-iteration recurrence ([[Analytics.pageRank]]) on the merged
    * adjacency — which is EDGE-registry-sized, not crawl-sized: the
    * expensive stage (outlink extraction from raw HTML) runs only on
    * the increment, and the merged result is provably ≡ the
    * from-scratch recompute (union is associative/idempotent; the
    * recurrence is a pure function of the edge set — the
    * q_incremental_pagerank oracle restates exactly that theorem).
    * Both inputs are (aCol, bCol) undirected pairs in any orientation;
    * output is (least, greatest)-normalized distinct. */
  def mergeHostEdges(standing: DataFrame, increment: DataFrame,
      aCol: String = "ha", bCol: String = "hb"): DataFrame = {
    def norm(df: DataFrame) = df.select(
      least(col(aCol), col(bCol)).as(aCol),
      greatest(col(aCol), col(bCol)).as(bCol))
    norm(standing).unionByName(norm(increment)).distinct
  }
}
