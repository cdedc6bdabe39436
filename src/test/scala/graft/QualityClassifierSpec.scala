package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** fastText-style hashed linear classifier: scoring is replicated here
  * in plain Scala (sha256 → bucket → integer weight) so the expected
  * values are derived independently of the DataFrame pipeline. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(feature: String): Int = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(feature.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    (java.lang.Long.parseLong(hex, 16) % 4096).toInt
  }

  private def weightOf(bucket: Int): Long =
    (bucket.toLong * 2654435761L + 104729L) % 2001L - 1000L

  private def expected(text: String): (Long, Long) = {
    val toks = text.trim.split("\\s+").toSeq
    val feats = toks.map("u:" + _) ++
      toks.sliding(2).filter(_.size == 2).map(p => "b:" + p.mkString(" "))
    val score = feats.map(f => weightOf(bucketOf(f))).sum
    (feats.size.toLong, score)
  }

  test("score equals the hand-computed hashed linear model") {
    val texts = Seq(
      (1L, "the quick brown fox"),
      (2L, "lorem ipsum dolor sit amet"),
      (3L, "one token"),
      (4L, "single"))
    val out = TextAnalysis.qualityClassifier(
        texts.toDF("doc_id", "text"), "doc_id", "text",
        TextAnalysis.classifierFixtureWeights(spark))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    texts.foreach { case (id, t) =>
      val (n, s) = expected(t)
      assert(out(id) === ((n, s, s > 0)), s"doc $id '$t'")
    }
  }

  test("empty and whitespace-only docs are absent; weights table is bounded") {
    val out = TextAnalysis.qualityClassifier(
        Seq((1L, ""), (2L, "   "), (3L, "real text")).toDF("doc_id", "text"),
        "doc_id", "text", TextAnalysis.classifierFixtureWeights(spark))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(3L))
    assert(TextAnalysis.classifierFixtureWeights(spark).count() === 4096L)
    // weight range is the documented [-1000, 1000]
    val mm = TextAnalysis.classifierFixtureWeights(spark)
      .agg(min("w"), max("w")).collect().head
    assert(mm.getLong(0) >= -1000L && mm.getLong(1) <= 1000L)
  }

  test("classifierApplyTable ≡ qualityClassifier under the same dense artifact") {
    // adversarial strings: tabs/newlines inside, space-only trim edges,
    // multi-space runs, empty/null — the split/trim quirk surface
    val texts = Seq(
      (1L, "the quick brown fox"),
      (2L, "  leading and trailing  "),
      (3L, "tab\tseparated\ttokens"),
      (4L, "newline\ninside text"),
      (5L, "multi   space    runs"),
      (6L, "single"),
      (7L, ""),
      (8L, "   "),
      (9L, null.asInstanceOf[String]),
      (10L, "\ttab-led text")) // space-trim keeps the tab → empty token
    val df = texts.toDF("doc_id", "text")
    val w = TextAnalysis.classifierFixtureWeights(spark, 512)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val trained = rows(TextAnalysis.qualityClassifier(df, "doc_id", "text",
      w, buckets = 512))
    val applied = rows(TextAnalysis.classifierApplyTable(df, "doc_id",
      "text", w, buckets = 512))
    assert(applied === trained)
    assert(!applied.keySet.exists(Set(7L, 8L, 9L))) // featureless absent
    // sparse artifact rejected loudly — it would silently drop features
    val e = intercept[IllegalArgumentException](
      TextAnalysis.classifierApplyTable(df, "doc_id", "text",
        w.filter(col("bucket") =!= 7), buckets = 512))
    assert(e.getMessage.contains("dense"))
  }
}
