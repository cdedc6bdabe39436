package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** Dev tool: grid-search ANN parameters for EXACT agreement with the
  * brute-force baselines on the driver fixtures. The registered
  * `q_ann_lsh_topk` / `q_ivf_topk` / `q_embedding_neardup` queries share
  * the exhaustive DuckDB oracle, which is valid only when approximate
  * recall is exactly 1 on the fixture — this tool finds the cheapest
  * parameters where that holds (with margin), per scale factor.
  *
  * Usage: runMain graft.tools.AnnTune [sfDir ...]
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("anntune", "32")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.filter(col("vec_id") < 10)

      def diff(approx: DataFrame, exact: DataFrame): (Long, Long, Long) = {
        val a = approx.count(); val e = exact.count()
        val missed = exact.exceptAll(approx).count()
        (a, e, missed)
      }

      val exactPairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      for ((bits, tables, mp) <- Seq((3, 32, false),
          (3, 8, true), (3, 10, true), (3, 12, true), (3, 16, true))) {
        val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4,
          bitsPerTable = bits, numTables = tables, multiProbe = mp)
        val (a, e, m) = diff(lsh.select("id_a", "id_b"), exactPairs.select("id_a", "id_b"))
        println(s"NEARDUP $dir bits=$bits tables=$tables mp=$mp lsh=$a exact=$e missed=$m")
      }

      val exactTopK = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      for ((bits, tables, mp) <- Seq((3, 32, false),
          (3, 8, true), (3, 10, true), (3, 12, true), (3, 16, true))) {
        val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
          bitsPerTable = bits, numTables = tables, multiProbe = mp)
        val (a, e, m) = diff(lsh, exactTopK)
        println(s"LSHTOPK $dir bits=$bits tables=$tables mp=$mp lsh=$a exact=$e missed=$m")
      }
      for (nProbe <- Seq(12, 14, 16)) {
        val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
          numCentroids = 16, nProbe = nProbe)
        val (a, e, m) = diff(ivf, exactTopK)
        println(s"IVFTOPK $dir nProbe=$nProbe ivf=$a exact=$e missed=$m")
      }
      for ((m8, ksub, rerank) <- Seq((16, 32, 128), (16, 32, 256),
          (16, 64, 128), (16, 64, 256), (32, 64, 128), (32, 64, 256))) {
        val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
          m = m8, ksub = ksub, rerank = rerank)
        val (a, e, m) = diff(pq, exactTopK)
        println(s"PQTOPK $dir m=$m8 ksub=$ksub rerank=$rerank pq=$a exact=$e missed=$m")
      }
      for ((nProbe, rerank) <- Seq((14, 128), (14, 256), (16, 256))) {
        val ivfpq = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
          numCentroids = 16, nProbe = nProbe, m = 16, ksub = 32, rerank = rerank)
        val (a, e, m) = diff(ivfpq, exactTopK)
        println(s"IVFPQTOPK $dir nProbe=$nProbe rerank=$rerank ivfpq=$a exact=$e missed=$m")
      }
      // big-k IVF (mini-batch-trained, 256 coarse cells): the fixture's
      // weak-neighbor embeddings are the worst case for coarse
      // quantization, so expect a high recall-1 probe count relative
      // to C — the interesting number is where misses hit 0
      for (nProbe <- Seq(64, 96, 128, 160, 192, 224, 256)) {
        val big = Similarity.ivfTopKBig(emb, queries, "vec_id", "embedding", 5,
          numCentroids = 256, nProbe = nProbe)
        val (a, e, m) = diff(big, exactTopK)
        println(s"IVFBIGK $dir C=256 nProbe=$nProbe big=$a exact=$e missed=$m")
      }
      // binary-quantization funnel: recall vs (bits, rerank depth) —
      // the near-orthogonal fixture is the hard regime for 1-bit codes
      // (shallow shortlists measurably miss; the registered 256/512
      // carries the margin this sweep maps out)
      for ((bits, rerank) <- Seq((64, 64), (64, 256), (128, 64),
          (128, 192), (128, 512), (256, 64), (256, 128), (256, 512))) {
        val bq = Similarity.binaryQuantTopK(emb, queries, "vec_id",
          "embedding", 5, rerank = rerank, numBits = bits)
        val (a, e, m) = diff(bq, exactTopK)
        println(s"BINQUANT $dir bits=$bits rerank=$rerank bq=$a exact=$e missed=$m")
      }
    }
    spark.stop()
  }
}
