package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style classifier inference under a SHIPPED weight artifact —
  * the apply half of the quality gate, as a single codegen'd scan
  * (the [[UnigramSegment]] deployment shape): the dense per-bucket
  * weight vector rides the task binary via `addReferenceObj`, and each
  * document is featurized (hashed uni+bigrams) and scored in ONE string
  * pass with zero shuffles — where the trainable-weights-table form
  * (`TextAnalysis.qualityClassifier`) pays an explode + two keyed
  * aggregations + a broadcast join per corpus pass.
  *
  * Parity contract (score-identical to `qualityClassifier` under a
  * TOTAL weight table, which is what a dense artifact is):
  *  - tokens = `split(trim(text), "\s+")` semantics: trim strips
  *    SPACES (0x20) only, `\s` is the Java class, empty/space-only
  *    text yields the one-empty-token quirk;
  *  - unigram features `u:tok` for every token EXCEPT the bare empty
  *    `u:` (the `.filter(__f =!= "u:")` quirk guard);
  *  - bigram features `b:tok1 tok2` for adjacent pairs when the
  *    trimmed text is nonempty and there are ≥ 2 tokens — INCLUDING
  *    empty tokens inside the array, exactly like `wordNgrams`;
  *  - bucket = sha52(feature) mod buckets: the first 13 hex chars of
  *    sha256 as a 52-bit integer — computed here straight from the
  *    digest bytes (12 nibbles + the high nibble of byte 6), no hex
  *    string allocated;
  *  - score_sum = Σ w[bucket], n_feats = feature count — both BIGINT,
  *    so the oracle compare is hash-exact.
  *
  * Output struct (n_feats long, score_sum long); null text → null;
  * featureless docs return (0, 0) for the caller to filter (matching
  * the join path's absent rows). */
case class ClassifierScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  require(weights.nonEmpty, "classifier_score needs a non-empty weight vector")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = ClassifierScore.schema

  override def prettyName: String = "classifier_score"

  override protected def nullSafeEval(input: Any): Any =
    ClassifierScore.compute(input.asInstanceOf[UTF8String].toString, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clfWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.ClassifierScore.compute(" +
        s"$input.toString(), $wRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierScore =
    copy(child = newChild)
}

object ClassifierScore {

  val schema: StructType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))

  /** Space-only trim — Spark/DuckDB `trim` semantics, NOT Java's
    * `String.trim` (which strips every char ≤ 0x20). */
  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** sha52 of the feature's UTF-8 bytes: bytes 0–5 (12 nibbles) plus
    * the high nibble of byte 6 = the first 13 hex chars as a long. */
  private def sha52(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xffL) >>> 4)
  }

  def compute(text: String, weights: Array[Long]): GenericInternalRow = {
    val buckets = weights.length
    val trimmed = spaceTrim(text)
    var n = 0L
    var score = 0L
    if (trimmed.nonEmpty) {
      val md = MessageDigest.getInstance("SHA-256")
      // limit -1 (keep trailing empties) is Spark split's default;
      // Java's default limit 0 drops them
      val toks = trimmed.split("\\s+", -1)
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          n += 1
          score += weights((sha52(md, "u:" + toks(i)) % buckets).toInt)
        }
        i += 1
      }
      if (toks.length >= 2) {
        i = 0
        while (i + 1 < toks.length) {
          n += 1
          score += weights(
            (sha52(md, "b:" + toks(i) + " " + toks(i + 1)) % buckets).toInt)
          i += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](n, score))
  }

  def score(text: Column, weights: Seq[Long]): Column =
    Bridge.column(ClassifierScore(Bridge.expression(text), weights.toArray))
}
