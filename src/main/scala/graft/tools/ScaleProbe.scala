package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** Scaling sanity probe (dev tool, results recorded in BASELINE.md):
  * grow the sf0.1 documents corpus K× and measure near-dup runtimes.
  *
  * Each replica is Caesar-shifted to a disjoint vocabulary so replicas
  * are NOT near-dups of each other — the planted dup structure stays
  * constant per replica and the true pair count grows linearly in K.
  * Near-linear runtime growth = the inverted-index / LSH join shapes
  * hold; quadratic growth would mean a pairwise blow-up bug. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scaleprobe", "32")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    for (k <- Seq(1, 2, 4, 8)) {
      val docs = (0 until k).map { i =>
        val shifted = alpha.drop(i) + alpha.take(i)
        base.select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          translate(col("text"), alpha, shifted).as("text"))
      }.reduce(_ unionAll _)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (tm, nm) = time(
        Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.6).count())
      val (tj, nj) = time(
        Dedup.jaccardNearDupPairs(docs, "doc_id", "text", 3, 0.6).count())
      val (ts, ns) = time(
        Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3).count())
      println(f"PROBE k=$k%d docs=${5000 * k}%d " +
        f"minhash=$tm%.1fs($nm%d pairs) jaccard=$tj%.1fs($nj%d) simhash=$ts%.1fs($ns%d)")
    }
    spark.stop()
  }
}
