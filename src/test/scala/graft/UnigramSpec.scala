package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.expressions.UnigramSegment
import graft.functions.TextAnalysis

/** Unigram-LM tokenizer (SentencePiece-style hard EM): the Viterbi DP
  * expression vs brute-force enumeration of EVERY segmentation (score,
  * piece count, and lexicographic tie-break — the DuckDB oracle's
  * selection rule), and the distributed trainer vs a driver reference
  * of the same seed/segment/recount/prune loop. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def bitlen(c: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(c)

  /** All segmentations of `w` into vocab pieces (unknown single chars
    * allowed at count 0 — the <unk> fallback), best by (score desc,
    * k asc, US-joined path asc). */
  private def refSegment(w: String, vocab: Seq[(String, Long)]): Seq[String] = {
    val m = vocab.toMap
    val b = bitlen(vocab.map(_._2).sum)
    val maxLen = vocab.map(_._1.length).max
    def seg(pos: Int): Seq[List[String]] =
      if (pos == w.length) Seq(Nil)
      else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
        val p = w.substring(pos, pos + l)
        if (m.contains(p) || l == 1) seg(pos + l).map(p :: _) else Nil
      }
    def score(path: List[String]): Int =
      path.map(p => m.get(p).map(bitlen).getOrElse(0) - b).sum
    seg(0).minBy(p => (-score(p), p.length, p.mkString("\u001f")))
  }

  private def sparkSegment(texts: Seq[String],
      vocab: Seq[(String, Long)]): Seq[Seq[String]] =
    texts.toDF("text")
      .select(UnigramSegment.segment(col("text"), vocab).as("t"))
      .collect()
      .map(r => Option(r.getSeq[String](0)).map(_.toSeq).orNull)
      .toSeq

  /** Driver reference of [[TextAnalysis.unigramTrain]]. */
  private def refTrain(words: Map[String, Long], rounds: Int, maxLen: Int,
      seedSize: Int, vocabSize: Int): Seq[(String, Long)] = {
    val sub = mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i))
      sub(w.substring(i, i + l)) += c
    def select(cnts: Map[String, Long], k: Int): Seq[(String, Long)] = {
      val top = cnts.toSeq.sortBy { case (p, c) => (-c, p) }.take(k)
      (top ++ cnts.toSeq.filter(_._1.length == 1)).distinct.sortBy(_._1)
    }
    var vocab = select(sub.toMap, seedSize)
    val chars = vocab.collect { case (p, _) if p.length == 1 => p }
    for (_ <- 1 to rounds) {
      val cnt = mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, c) <- words; p <- refSegment(w, vocab)) cnt(p) += c
      val cand = cnt.toMap ++
        chars.filterNot(cnt.contains).map(_ -> 1L).toMap
      vocab = select(cand, vocabSize)
    }
    vocab
  }

  test("Viterbi DP ≡ exhaustive argmax on random tie-rich corpora") {
    val rnd = new Random(41)
    for (trial <- 1 to 6) {
      // tiny alphabet → many equal-count pieces → forced tie-breaks
      val alpha = "abc"
      val words = Seq.fill(12)(
        (1 to (2 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(3))).mkString)
      val pieces = words.flatMap(w =>
        (0 until w.length).flatMap(i =>
          (1 to math.min(3, w.length - i)).map(l => w.substring(i, i + l))))
      val vocab = pieces.distinct.sorted
        .map(p => (p, 1L + rnd.nextInt(6).toLong))
      val got = sparkSegment(words, vocab)
      words.zip(got).foreach { case (w, g) =>
        assert(g === refSegment(w, vocab), s"trial $trial word '$w'")
      }
    }
  }

  test("unknown chars fall back to single-char pieces; known pieces preferred") {
    val vocab = Seq(("ab", 8L), ("a", 3L), ("b", 2L))
    // 'x' and 'z' absent: each must surface as its own piece
    assert(sparkSegment(Seq("xabz"), vocab).head === Seq("x", "ab", "z"))
  }

  test("whitespace pre-tokenization, nulls, and empties") {
    val vocab = Seq(("ab", 4L), ("a", 2L), ("b", 2L))
    val df = Seq[(Integer, String)]((1, "ab a  b"), (2, "   "), (3, null))
      .toDF("id", "text")
      .select(col("id"), UnigramSegment.segment(col("text"), vocab).as("t"))
      .orderBy("id").collect()
    assert(df(0).getSeq[String](1) === Seq("ab", "a", "b"))
    assert(df(1).getSeq[String](1) === Seq.empty)
    assert(df(2).isNullAt(1))
  }

  test("segmentation reconstructs the input words exactly") {
    val vocab = TextAnalysis.unigramTrain(
      Tables.documents(spark, sf), "text",
      rounds = 2, maxPieceLen = 4, seedSize = 64, vocabSize = 40)
    val rows = Tables.documents(spark, sf).limit(50)
      .select(col("text"),
        UnigramSegment.segment(col("text"), vocab).as("t"))
      .collect()
    rows.foreach { r =>
      val expected = r.getString(0).trim.split("\\s+").mkString
      assert(r.getSeq[String](1).mkString === expected)
    }
  }

  test("distributed trainer ≡ driver reference loop on random corpora") {
    val rnd = new Random(97)
    for (trial <- 1 to 3) {
      val alpha = "abcd"
      val words = Seq.fill(10)(
        (1 to (2 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(4))).mkString)
      val corpus = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(5))(words(rnd.nextInt(words.length)))
          .mkString(" "))
      val wordCounts = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val got = TextAnalysis.unigramTrain(corpus.toDF("text"), "text",
        rounds = 2, maxPieceLen = 3, seedSize = 20, vocabSize = 12)
      val want = refTrain(wordCounts, rounds = 2, maxLen = 3,
        seedSize = 20, vocabSize = 12)
      assert(got === want, s"trial $trial")
    }
  }

  test("trainer invariants: alphabet retained, counts positive, size bounded") {
    val vocab = TextAnalysis.unigramTrain(
      Tables.documents(spark, sf), "text",
      rounds = 2, maxPieceLen = 4, seedSize = 64, vocabSize = 40)
    val corpusChars = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect().toSet
    val vocabSet = vocab.map(_._1).toSet
    assert(corpusChars.subsetOf(vocabSet), "every corpus char stays")
    assert(vocab.forall(_._2 >= 1L))
    assert(vocab.forall(_._1.length <= 4))
    assert(vocab.count(_._1.length > 1) <= 40)
    assert(vocab.exists(_._1.length > 1),
      "EM must learn at least one multi-char piece on this corpus")
  }

  test("unigramApplyTable: shipped artifact ≡ direct segmentation; guards fire") {
    import spark.implicits._
    val docs = Seq((1L, "table value scan"), (2L, "  "), (3L, "zebra qux"))
      .toDF("doc_id", "text")
    val artifact = Seq(("table", 900L), ("val", 700L), ("ue", 650L),
      ("scan", 520L)) ++ ('a' to 'z').map(c => c.toString -> 40L)
    // the table-shipped path ≡ segmenting with the same vocab directly
    val got = TextAnalysis.unigramApplyTable(docs, "doc_id", "text",
        artifact.toDF("piece", "cnt")).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    val direct = docs
      .select(col("doc_id"),
        UnigramSegment.segment(col("text"), artifact).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), array_join(col("t"), "|"),
        size(col("t")).cast("long"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got === direct)
    assert(got.map(_._1) === Seq(1L, 3L)) // whitespace-only doc omitted
    assert(got.head._2 === "table|val|ue|scan")
    // corpus-sized frame must fail loudly, not become driver state
    val big = spark.range(0, 100).select(
      concat(lit("p"), col("id")).as("piece"), lit(1L).as("cnt"))
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.unigramApplyTable(docs, "doc_id", "text", big,
        maxVocab = 50)
    }
    assert(e1.getMessage.contains("maxVocab"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.unigramApplyTable(docs, "doc_id", "text",
        Seq(("a", 1L), ("a", 2L)).toDF("piece", "cnt"))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("tokenizerFertility ≡ full-corpus per-occurrence totals") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.tokenizerFertility(docs, "text",
      numMerges = 8, uniRounds = 2, maxPieceLen = 4, seedSize = 64,
      vocabSize = 40).collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(got.keySet == Set("bpe", "unigram"))
    // independent formulation: explode EVERY word occurrence (no
    // distinct-word weighting) and total the same segmenters over it —
    // equality proves the weighted shortcut counts occurrences right
    val merges = TextAnalysis.bpeTrainMerges(docs, "text", 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val uni = TextAnalysis.unigramTrain(docs, "text", 2, 4, 64, 40)
    val occ = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    def naive(pieces: org.apache.spark.sql.Column) =
      occ.agg(count(lit(1)).as("nw"), sum(size(pieces)).as("np"),
          sum(length(col("w"))).as("nc"))
        .as[(Long, Long, Long)].head()
    for ((name, pieces) <- Seq(
        "bpe" -> TextAnalysis.bpeTokens(col("w"), merges),
        "unigram" -> UnigramSegment.segment(col("w"), uni))) {
      val (nw, np, nc) = naive(pieces)
      val (gw, gp, fert, cpp) = got(name)
      assert(gw == nw && gp == np, s"$name totals")
      assert(fert == np.toDouble / nw && cpp == nc.toDouble / np,
        s"$name ratios")
    }
  }
}
