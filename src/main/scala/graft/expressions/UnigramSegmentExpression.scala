package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi segmentation as a
  * codegen'd Catalyst expression — the APPLY half of the unigram
  * tokenizer whose TRAINING loop is
  * [[graft.functions.TextAnalysis.unigramTrain]] (the way
  * [[BpeEncode]] applies what `bpeTrainMerges` learns).
  *
  * Whitespace pre-tokenization (`trim` + `\s+`, the
  * [[graft.functions.TextAnalysis.tokens]] convention), then per word
  * the best segmentation into vocabulary pieces under a QUANTIZED
  * unigram language model: piece log-probabilities are rounded to
  * whole bits — score(piece) = bitlen(count) − bitlen(Σ vocab counts)
  * (both integer-exact in any engine: `length(bin(c))`) — so Viterbi
  * maximizes an INTEGER objective and the argmax is a pure function of
  * the integer count table. A float log-prob lattice would be the
  * production scoring; the whole-bit quantization is the cross-engine-
  * exact restatement (the integer-weight precedent of
  * `qualityClassifierScore`). Every per-position log-prob is negative
  * (count < total ⇒ bitlen(count) ≤ bitlen(total), minus-one keeps it
  * so; see the B requirement below), so fewer/more-frequent pieces win
  * — the unigram-LM trade-off survives quantization.
  *
  * Tie-break, matching the oracle's path enumeration exactly:
  * maximal score, then fewest pieces, then lexicographically smallest
  * token sequence — compared as the US(0x1f)-joined string, which for
  * equal piece counts equals element-wise sequence order because no
  * word can contain chars ≤ 0x1f: the pre-tokenizer splits on
  * `[\s\x00-\x1f]+`, not bare `\s+` (Java `\s` misses
  * U+0000–U+0008/U+000E–U+001F, so a literal US/NUL in the text would
  * otherwise corrupt the joined-path compare and the final split —
  * control chars are delimiters here, same as whitespace).
  *
  * Chars absent from the vocabulary segment as single-char pieces of
  * count 0 (bitlen 0) — the <unk> fallback; a trained vocabulary
  * always contains every corpus char ([[graft.functions.TextAnalysis
  * .unigramTrain]] floors chars at count 1), so the fallback only
  * fires on out-of-corpus text. BMP text only (positions are char
  * positions, and the tie-break's UTF-16 vs UTF-8 orders agree on the
  * BMP) — the [[BpeEncode]] constraint.
  *
  * Output `array<string>` of pieces across all words in order; null
  * text → null; whitespace-only → empty array. One codegen'd pass per
  * row, no shuffle — the vocabulary table rides the task binary via
  * `addReferenceObj` (the IVF-centroid/BPE-merges budget: vocab-sized
  * driver state, torrent-broadcast to executors).
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression {

  require(pieces.nonEmpty, "unigram_segment needs a non-empty vocabulary")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unigram_segment"

  private def bitlen(c: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(c)

  /** piece → bitlen(count); B = bitlen(Σ counts) normalizer. Σ > each
    * count ⇒ every score − B < 0 (a zero-cost piece would make longer
    * segmentations free and break the LM trade-off). */
  @transient private lazy val scores: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    pieces.foreach { case (p, c) =>
      require(c >= 1, s"piece '$p' has count $c < 1")
      m.put(p, Integer.valueOf(bitlen(c)))
    }
    m
  }
  @transient private lazy val bNorm: Int = bitlen(pieces.map(_._2).sum)
  @transient private lazy val maxPieceLen: Int = pieces.map(_._1.length).max

  def segment(u: UTF8String): ArrayData = {
    // control chars ≤ 0x1f are delimiters like whitespace (see class
    // doc) — keeps the US(0x1f) path-join reserved inside viterbi
    val text = u.toString.replaceAll("[\\s\\x00-\\x1f]+", " ").trim
    val out = new ArrayBuffer[UTF8String]()
    if (text.nonEmpty) {
      text.split(" ").foreach { w => if (w.nonEmpty) viterbi(w, out) }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Exact integer Viterbi with the three-level tie-break. Optimal
    * substructure holds at every level: score and piece count are
    * additive, and for equal piece counts the joined-string order is
    * concatenation-monotone, so extending only each position's best
    * (score, k, path) yields the global argmax the oracle's full path
    * enumeration selects. */
  private def viterbi(w: String, out: ArrayBuffer[UTF8String]): Unit = {
    val n = w.length
    val bestScore = new Array[Int](n + 1)
    val bestK = new Array[Int](n + 1)
    val bestPath = new Array[String](n + 1)
    bestPath(0) = ""
    var j = 1
    while (j <= n) {
      var haveBest = false
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (bestPath(i) != null) {
          val piece = w.substring(i, j)
          val s = scores.get(piece)
          // unknown multi-char: not a lattice edge; unknown char: <unk>
          // fallback at bitlen 0
          val pieceScore =
            if (s != null) s.intValue - bNorm
            else if (j - i == 1) -bNorm
            else Int.MinValue
          if (pieceScore != Int.MinValue) {
            val cs = bestScore(i) + pieceScore
            val ck = bestK(i) + 1
            val cp = if (i == 0) piece else bestPath(i) + "\u001f" + piece
            val better = !haveBest ||
              cs > bestScore(j) ||
              (cs == bestScore(j) && (ck < bestK(j) ||
                (ck == bestK(j) && cp.compareTo(bestPath(j)) < 0)))
            if (better) {
              bestScore(j) = cs; bestK(j) = ck; bestPath(j) = cp
              haveBest = true
            }
          }
        }
        i += 1
      }
      if (!haveBest) bestPath(j) = null
      j += 1
    }
    // single-char fallback edges make every position reachable
    bestPath(n).split("\u001f").foreach(p => out += UTF8String.fromString(p))
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { input =>
      val self = ctx.addReferenceObj("unigramSegment", this,
        classOf[UnigramSegment].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.segment($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  def segment(text: Column, pieces: Seq[(String, Long)]): Column =
    Bridge.column(UnigramSegment(Bridge.expression(text), pieces))
}
