package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** One-pass TextStats expression vs the per-feature Column functions:
  * same values (the oracle contract), incl. the empty-split quirk. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String) =
    Seq(text).toDF("t").select(TextAnalysis.textStats(col("t")).as("st"))
      .select("st.*").collect().head

  test("matches per-feature Column functions on the fixture") {
    val both = Tables.documents(spark, sf).select(
        TextAnalysis.textStats(col("text")).as("st"),
        TextAnalysis.tokenCount(col("text")).as("tc"),
        TextAnalysis.punctCount(col("text")).as("pc"),
        TextAnalysis.stopwordCount(col("text")).as("sc"))
      .filter(
        col("st.token_count") =!= col("tc") ||
        col("st.punct_count") =!= col("pc") ||
        col("st.stopword_count") =!= col("sc"))
    assert(both.count() === 0)
  }

  test("counts tokens, punct, stopwords, token length in one pass") {
    val r = stats("  the cat, sat!  ")
    assert(r.getAs[Int]("token_count") === 3)
    assert(r.getAs[Int]("char_count") === 17)
    assert(r.getAs[Int]("punct_count") === 2)
    assert(r.getAs[Int]("stopword_count") === 1)
    assert(r.getAs[Long]("token_len_sum") === 11L) // "the","cat,","sat!"
  }

  test("matches the Column functions on awkward edges: tabs, emoji, empties") {
    val edges = Seq(
      "\tthe cat\t",       // non-space ws survives trim -> empty tokens
      "a \t b\n c",        // mixed internal whitespace
      "hi 😀 x", // surrogate pair counts as ONE codepoint
      "the",
      "  spaced  ")
    val both = edges.toDF("text").select(
        TextAnalysis.textStats(col("text")).as("st"),
        TextAnalysis.tokenCount(col("text")).as("tc"),
        length(col("text")).as("cc"),
        TextAnalysis.punctCount(col("text")).as("pc"),
        TextAnalysis.stopwordCount(col("text")).as("sc"))
      .collect()
    both.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getAs[Int]("token_count") === r.getAs[Int]("tc"))
      assert(st.getAs[Int]("char_count") === r.getAs[Int]("cc"))
      assert(st.getAs[Int]("punct_count") === r.getAs[Int]("pc"))
      assert(st.getAs[Int]("stopword_count") === r.getAs[Int]("sc"))
    }
  }

  test("empty and whitespace-only text reproduce the [''] split quirk") {
    for (t <- Seq("", "   ")) {
      val r = stats(t)
      assert(r.getAs[Int]("token_count") === 1) // split quirk parity
      assert(r.getAs[Long]("token_len_sum") === 0L)
      assert(r.getAs[Int]("stopword_count") === 0)
    }
  }

  test("qualityScore via struct equals the documented arithmetic") {
    val q = Seq("the cat sat on the mat").toDF("t")
      .select(TextAnalysis.qualityScore(col("t")).as("q"))
      .collect().head.getDouble(0)
    // tc=6, punct=0, stop=3 ("the"×2 + "on"∉list... only "the","the")
    // recompute expected directly:
    val tc = 6.0; val pr = 0.0; val sr = 2.0 / 6.0; val al = 17.0 / 6.0
    val expected = math.min(tc / 100, 1.0) * 0.3 +
      (1.0 - math.min(pr * 4, 1.0)) * 0.3 +
      math.min(sr * 5, 1.0) * 0.2 +
      (1.0 - math.min(math.abs(al - 5.0) / 5.0, 1.0)) * 0.2
    assert(math.abs(q - expected) < 1e-12)
  }
}
