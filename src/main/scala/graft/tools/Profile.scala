package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** Ad-hoc stage-level profiling for the bench's hottest queries — NOT
  * part of the driver contract; run manually:
  *   sbt "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
  private def exhaust(df: DataFrame): Long = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    System.nanoTime() - t0
  }

  private def time(name: String)(df: => DataFrame): Unit = {
    val ns1 = exhaust(df)
    val ns2 = exhaust(df)
    println(f"[profile] $name%-45s run1 ${ns1 / 1e9}%8.2f s   run2 ${ns2 / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-profile", cpus)

    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    println(s"[profile] docs=${docs.count()} emb=${emb.count()}")

    // ---- q_embedding_neardup breakdown -------------------------------
    val planes = Similarity.hyperplanes(3 * 32, 64)
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
      .filter(col("norm") > 0)
    def bucketRows(idn: String): DataFrame =
      v.select(col("id").as(idn),
        posexplode(graft.expressions.LshExpressions.hyperplaneBuckets(
          col("v"), planes, 32, 3)).as(Seq("tbl", "bkt")))
    time("emb: bucketRows only")(bucketRows("id_a"))
    val cand = bucketRows("id_a").join(
        bucketRows("id_b").withColumnRenamed("id_b", "idb")
          .withColumnRenamed("idb", "id_b"), Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    println(s"[profile] emb cand pairs = ${cand.count()}  (n=${v.count()}, all-pairs=${v.count() * (v.count() - 1) / 2})")
    time("emb: full lshNearDupPairs")(
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4, 3, 32))

    // ---- q_simhash_neardup breakdown ---------------------------------
    time("simhash: signatures (xxhash64)")(
      Dedup.simhashSignatures(docs, "doc_id", "text"))
    time("simhash: signatures (portable sha)")(
      Dedup.simhashSignatures(docs, "doc_id", "text", Dedup.portableTokenHash))
    time("simhash: tokens explode only")(
      docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextAnalysis.tokens(col("text")))).as("t")))
    time("simhash: full (portable)")(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3, Dedup.PortableSha))
    time("simhash: full (xxhash64)")(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3))

    // ---- jaccard breakdown -------------------------------------------
    time("jaccard: sets (shingle arrays) only")(
      docs.select(col("doc_id").as("id"),
          array_distinct(graft.functions.TextAnalysis.wordNgrams(col("text"), 3)).as("sh"))
        .repartition(col("id"))
        .filter(size(col("sh")) > 0))
    time("jaccard: full (cap=20)")(
      Dedup.jaccardNearDupPairs(docs, "doc_id", "text", 3, 0.6, Some(20)))
    time("jaccard: full (uncapped)")(
      Dedup.jaccardNearDupPairs(docs, "doc_id", "text", 3, 0.6, None))
    val pairs = Dedup.jaccardNearDupPairs(docs, "doc_id", "text", 3, 0.6, Some(20))
    time("components: full")(
      Dedup.nearDupComponents(docs, "doc_id", pairs))

    spark.stop()
  }
}
