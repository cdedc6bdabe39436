package graft

import scala.annotation.tailrec
import scala.collection.mutable

import graft.functions.TextAnalysis

/** BPE vocabulary training vs a driver-side reference implementation of
  * the Sennrich et al. 2016 loop (overlap pair counting, greedy
  * left-to-right merge application, count-then-lexicographic argmax) —
  * the same semantics the DuckDB oracle replays. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: word-count map in, learned merge table out. */
  private def refTrain(words: Map[String, Long],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    @tailrec
    def applyMerge(s: List[String], l: String, r: String,
        acc: List[String]): List[String] = s match {
      case a :: b :: rest if a == l && b == r =>
        applyMerge(rest, l, r, (l + r) :: acc)
      case a :: rest => applyMerge(rest, l, r, a :: acc)
      case Nil => acc.reverse
    }
    var seqs: Map[String, (List[String], Long)] =
      words.map { case (w, c) => w -> (w.map(_.toString).toList, c) }
    val out = mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (t <- 1 to numMerges if out.size == t - 1) {
      val pc = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((_, (s, c)) <- seqs; pair <- s.zip(s.drop(1)))
        pc(pair) += c
      if (pc.nonEmpty) {
        val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((t, l, r, c))
        seqs = seqs.map { case (w, (s, cnt)) =>
          w -> (applyMerge(s, l, r, Nil), cnt)
        }
      }
    }
    out.toSeq
  }

  private def train(corpus: Seq[String], numMerges: Int) =
    TextAnalysis.bpeTrainMerges(corpus.toDF("text"), "text", numMerges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq

  test("learned merges ≡ reference trainer on random corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      // small alphabet forces heavy pair collisions and repeated runs
      val alpha = "abcd"
      val vocabWords = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(7)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val corpus = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(10)))
          .map(_ => vocabWords(rnd.nextInt(vocabWords.size))).mkString(" ")
      }
      val wordCounts = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val expected = refTrain(wordCounts, 6)
      val got = train(corpus, 6)
      assert(got == expected, s"[trial $trial] got $got want $expected")
    }
  }

  test("greedy run semantics: 'aaaa' merges left-to-right, non-overlapping") {
    // one word 'aaaa' ×3: pairs (a,a) count 9 → merge aa; then 'aa aa'
    // has ONE (aa,aa) pair per word → merge aaaa
    val got = train(Seq.fill(3)("aaaa"), 2)
    assert(got == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("tie-break is lexicographic on (lhs, rhs)") {
    // 'ab' and 'ba' each appear 5 times as the only pairs: counts tie
    // at 5, (a,b) < (b,a) byte-order → ab learned first
    val got = train(Seq.fill(5)("ab ba"), 1)
    assert(got == Seq((1, "a", "b", 5L)))
  }

  test("pair exhaustion stops the table early; single-char corpus learns nothing") {
    assert(train(Seq("a b c", "a c"), 3).isEmpty)
    // 'ab' ×2: step 1 merges (a,b); afterwards every word is one
    // symbol → steps 2..5 dropped
    val got = train(Seq("ab ab"), 5)
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("learned merges feed bpeTokens (train → apply composition)") {
    val corpus = Seq.fill(10)("the then there") ++ Seq.fill(4)("other")
    val learned = train(corpus, 5).map { case (_, l, r, _) => (l, r) }
    // genuine training output satisfies BpeEncode's invariants
    // (constituents precede, outputs unique) — apply must not throw,
    // and the hottest word must tokenize into few learned symbols
    val toks = Seq("the then")
      .toDF("text")
      .select(TextAnalysis.bpeTokens(org.apache.spark.sql.functions.col("text"),
        learned).as("t"))
      .head().getSeq[String](0)
    assert(toks.nonEmpty && toks.size < "the then".length,
      s"learned merges did not compress: $toks")
  }
}
