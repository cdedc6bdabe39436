package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a document in ONE compiled pass.
  *
  * Replaces `array_distinct(wordNgrams(text, n))`, whose chained
  * `zip_with` formulation runs on Catalyst's interpreted higher-order-
  * function path — profiled at ~45% of the whole exact-Jaccard pipeline.
  * Here: trim, tokenize, join n consecutive tokens, de-duplicate —
  * straight-line JVM code per row.
  *
  * Semantics are byte-for-byte the compositional form's (spec'd
  * equivalent in DedupSpec):
  *  - trim strips ASCII SPACES only (Spark `trim` semantics — NOT
  *    Java's `String.trim`, which also strips tabs/newlines);
  *  - tokens = Java-regex `\s+` split with no limit (an all-blank doc
  *    tokenizes to [""] upstream; the empty-doc guard below returns []
  *    first, matching `wordNgrams`' `length(trim(text)) === 0` branch);
  *  - fewer than n tokens → empty array;
  *  - n-grams joined with a single space, first-occurrence order kept
  *    by the distinct.
  */
case class DistinctWordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "distinct_word_ngrams"

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  def shingles(text: UTF8String): ArrayData = {
    val raw = text.toString
    // Spark trim: spaces only
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    if (lo == hi) return new GenericArrayData(Array.empty[Any])
    val toks = ws.split(raw.substring(lo, hi), -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("shingler", this,
        classOf[DistinctWordNgrams].getName)
      s"${ev.value} = $self.shingles($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): DistinctWordNgrams =
    copy(child = newChild)
}

object ShingleExpressions {
  /** `array_distinct(wordNgrams(text, n))` in one compiled pass. */
  def distinctWordNgrams(text: Column, n: Int): Column =
    Bridge.column(DistinctWordNgrams(Bridge.expression(text), n))
}
