package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** True-BPE merge loop (expressions.BpeEncode) vs hand-derived
  * expectations, plus the structural invariants the oracle replay
  * depends on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(TextAnalysis.bpeTokens(col("t")).as("toks"))
      .collect().head.getSeq[String](0)

  test("merge loop follows rank order, not textual order") {
    // "the": (t,h)=r0 fires before (h,e) could; then (th,e)=r1
    assert(enc("the") === Seq("the"))
    // " the": (th,e)=r1 outranks ( ,th)=r13, so ' the' never forms —
    // the result is [' ', 'the'], not [' the'] (true BPE is greedy by
    // RANK; a longest-match tokenizer would differ here)
    assert(enc("the the") === Seq("the", " ", "the"))
    // " rest": r7 re, r10 st, r20 ' re', r21 ' rest' — full merge
    assert(enc("a rest") === Seq("a", " rest"))
    // 'rats': r22 rat; s unattached (no (rat,s) rule); 'es' needs (e,s)
    assert(enc("rats") === Seq("rat", "s"))
  }

  test("same-pair runs merge left-to-right non-overlapping") {
    // th th th th as one word: 4 (t,h) merges, no (th,th) rule
    assert(enc("thththth") === Seq("th", "th", "th", "th"))
    // odd run: trailing t stays
    assert(enc("ththt") === Seq("th", "th", "t"))
  }

  test("pre-tokenizer boundaries are BPE boundaries") {
    // 'resting' one word: re+st+ing? walk: r2 in, r7 re, r10 st,
    // r12 ing — final [re, st, ing]; digits pre-tokenize separately
    assert(enc("resting") === Seq("re", "st", "ing"))
    assert(enc("resting99") === Seq("re", "st", "ing", "9", "9"))
  }

  test("null, empty, and whitespace-only inputs") {
    val out = Seq[Option[String]](None, Some(""), Some("   "))
      .toDF("t")
      .select(TextAnalysis.bpeTokens(col("t")).as("toks"))
      .collect().map(r => Option(r.getSeq[String](0)))
    assert(out(0).isEmpty)          // null → null
    assert(out(1).contains(Seq()))  // empty → no tokens
    // one \s+ pre-token, split to chars; no ( , ) rule → stays split
    assert(out(2).contains(Seq(" ", " ", " ")))
  }

  test("merges fixture holds the oracle-equivalence invariants") {
    // (validated at class-init — touching the object would have thrown;
    // re-assert here so a future edit that drops the check still fails)
    val produced = scala.collection.mutable.Set[String]()
    TextAnalysis.BpeMerges.zipWithIndex.foreach { case ((a, b), r) =>
      for (s <- Seq(a, b))
        assert(s.length == 1 || produced.contains(s), s"rank $r side '$s'")
      assert(!produced.contains(a + b), s"rank $r duplicate output")
      produced += (a + b)
    }
  }

  test("bpeTokenCount lower-bounds the true token count") {
    val df = Tables.documents(spark, sf).limit(50)
      .withColumn("est", TextAnalysis.bpeTokenCount(col("text")))
      .withColumn("real", size(TextAnalysis.bpeTokens(col("text"))))
    // every pre-token yields ≥ 1 merged token, so the estimator can
    // never exceed the true count (it counts pre-tokens; merges start
    // from characters within each)
    assert(df.filter(col("real") < col("est")).count() === 0)
  }
}
