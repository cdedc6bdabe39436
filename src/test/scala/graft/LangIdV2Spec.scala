package graft

import org.apache.spark.sql.functions._

import graft.expressions.LangIdScores
import graft.functions.TextAnalysis

/** Classifier-grade language ID: scoring replicated independently in
  * plain Scala (padded 2/3-grams → sha52 bucket → per-language integer
  * head) so expected values are derived outside the expression. */
class LangIdV2Spec extends SparkSpec {
  import spark.implicits._

  private val buckets = 1024

  private def bucketOf(g: String): Int = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(g.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  private def grams(tok: String): Seq[String] = {
    val p = "_" + tok + "_"
    (2 to 3).flatMap(n => (0 to p.length - n).map(i => p.substring(i, i + n)))
  }

  private def expected(text: String): (String, Long, Long) = {
    val heads = TextAnalysis.langMarkers.map { case (l, ws) =>
      val w = new Array[Long](buckets)
      ws.foreach(word => grams(word).foreach(g => w(bucketOf(g)) += 1))
      (l, w)
    }
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val scores = heads.map { case (l, w) =>
      l -> toks.flatMap(grams).map(g => w(bucketOf(g))).sum
    }
    val best = scores.maxBy(_._2) // stable: first max in declaration order
    val second = scores.filter(_._1 != best._1)
      .map(_._2).foldLeft(0L)(math.max)
    (if (best._2 == 0) "und" else best._1, best._2, best._2 - second)
  }

  test("scores, argmax, margin equal the hand-computed n-gram heads") {
    val texts = Seq(
      (1L, "the quick brown fox and the dog"),
      (2L, "der hund ist nicht hier und das ist gut"),
      (3L, "el perro que ladra no muerde y los gatos"),
      (4L, "le chat est dans les maisons et une porte"),
      (5L, "oder tabla"), // NO exact marker words — partial-gram evidence
      (6L, "zzz qqq xxx"))
    val out = texts.toDF("id", "text")
      .select(col("id"), TextAnalysis.langIdV2(col("text")).as("v"))
      .select(col("id"), col("v.lang"), col("v.score"), col("v.margin"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    texts.foreach { case (id, t) =>
      assert(out(id) === expected(t), s"doc $id '$t'")
    }
    // the partial-evidence doc: the marker baseline sees no exact hit
    val v1 = texts.toDF("id", "text")
      .select(col("id"), TextAnalysis.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1(5L) === "und")
    assert(out(5L)._1 !== "und", "v2 must route on partial n-gram evidence")
  }

  test("null → null, empty/whitespace → (und, 0, 0), BMP contract holds on zh") {
    val out = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
        (4L, "的 是 了 在"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.langIdV2(col("text")).as("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null
         else (r.getStruct(1).getString(0), r.getStruct(1).getLong(1))))
      .toMap
    assert(out(1L) === null)
    assert(out(2L) === (("und", 0L)))
    assert(out(3L) === (("und", 0L)))
    assert(out(4L)._1 === "zh")
  }

  test("head artifact triples are the dense matrix's nonzero cells") {
    val (langs, w) = LangIdScores.profileHeads(TextAnalysis.langMarkers, buckets)
    val triples = LangIdScores.headTriples(TextAnalysis.langMarkers, buckets)
    assert(langs === TextAnalysis.langMarkers.map(_._1))
    assert(triples.forall { case (l, b, x) =>
      w(langs.indexOf(l) * buckets + b) == x && x > 0 })
    assert(triples.size === w.count(_ != 0L))
  }
}
