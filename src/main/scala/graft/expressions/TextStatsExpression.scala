package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics: token count, char count, ASCII-punctuation
  * count, stopword count, and summed token length in a single scan of
  * the string.
  *
  * Why a custom expression: the Column-function formulation evaluates
  * `split(trim(text), "\s+")` once PER FEATURE (CollapseProject inlines
  * the shared subexpression into every consumer), so a 5-feature stats
  * projection tokenizes each document ~6 times with a regex. At
  * 100 TB × 6 regex passes that is the whole job's CPU bill. This
  * expression makes one allocation-light pass and returns a struct.
  *
  * Parity contract (matches `split(trim(text), "\s+")` and the DuckDB
  * oracle exactly, validated by TextStatsSpec against the Column
  * functions on the fixture):
  *  - all counts are CODEPOINTS (Spark's and DuckDB's `length()`
  *    semantics), so surrogate pairs count once;
  *  - `trim` strips SPACES only (0x20) — exactly like Spark/DuckDB
  *    `trim` — so a leading/trailing run of other whitespace (tab,
  *    newline) yields the same empty token `split(..., -1)` produces;
  *  - token = maximal run of non-whitespace (Java regex `\s` class:
  *    space \t \n \x0B \f \r) in the trimmed text;
  *  - space-only/empty text ⇒ ONE empty token (both Spark's
  *    `split("", ...)` and DuckDB's `string_split_regex('', ...)`
  *    return `['']` — we reproduce that quirk);
  *  - punctuation = ASCII `!-/ :-@ [-` {-~`;
  *  - stopword match is exact string equality.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = TextStats.schema

  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String].toString, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.TextStats.compute($input.toString(), $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("token_count", IntegerType, nullable = false),
    StructField("char_count", IntegerType, nullable = false),
    StructField("punct_count", IntegerType, nullable = false),
    StructField("stopword_count", IntegerType, nullable = false),
    StructField("token_len_sum", LongType, nullable = false)))

  private def isWs(c: Int): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def isPunct(c: Int): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** Single pass; called from both interpreted eval and generated code.
    * Operates on CODEPOINTS, not UTF-16 units: Spark's `length()` and
    * DuckDB's `length()` both count codepoints, so a surrogate pair
    * (emoji) must count as ONE char for the parity contract to hold. */
  def compute(s: String, stop: java.util.HashSet[String]): InternalRow = {
    val cps: Array[Int] = s.codePoints().toArray
    val len = cps.length
    var punct = 0
    var tokens = 0
    var stopHits = 0
    var tokenLenSum = 0L
    var i = 0
    def emptyToken(): Unit = { tokens += 1; if (stop.contains("")) stopHits += 1 }
    // trim() in Spark AND DuckDB strips SPACES only (0x20), not \s —
    // match that, and reproduce split()'s empty tokens for leading/
    // trailing non-space whitespace runs
    var start = 0
    var end = len
    while (start < end && cps(start) == ' ') start += 1
    while (end > start && cps(end - 1) == ' ') end -= 1
    i = 0
    while (i < len) { // punctuation counts over the UNtrimmed text
      if (isPunct(cps(i))) punct += 1
      i += 1
    }
    if (end == start) {
      // split('', '\s+') == [''] quirk: one empty token
      emptyToken()
    } else {
      if (isWs(cps(start))) emptyToken() // leading \s run ⇒ [""] prefix
      i = start
      var tokStart = -1
      while (i <= end) {
        val atWs = i == end || isWs(cps(i))
        if (!atWs && tokStart < 0) tokStart = i
        if (atWs && tokStart >= 0) {
          tokens += 1
          tokenLenSum += (i - tokStart)
          if (stop.contains(new String(cps, tokStart, i - tokStart))) stopHits += 1
          tokStart = -1
        }
        i += 1
      }
      if (isWs(cps(end - 1))) emptyToken() // trailing \s run ⇒ [""] suffix
    }
    new GenericInternalRow(Array[Any](tokens, len, punct, stopHits, tokenLenSum))
  }

  /** Column-API entry point. */
  def stats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextStats(Bridge.expression(text), stopwords))
}
