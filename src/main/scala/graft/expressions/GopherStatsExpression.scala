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

/** One-pass raw counts for the Gopher rule gate
  * (`TextAnalysis.gopherRules`): token count, summed token length,
  * symbol occurrences (`#` and `...`/`…`), line count, bullet-started
  * and ellipsis-ended line counts, alphabetic-token count, and DISTINCT
  * stop-list hits — one codepoint scan, one small per-row allocation.
  *
  * Why a custom expression (the TextStats story, §same file): the
  * Column formulation references the `split(trim(text), "\s+")` subtree
  * from four features and the line split from two, and those array
  * HOFs (`filter`, `aggregate`) are interpreted — CollapseProject
  * clones the tokenization into every consumer with no codegen CSE to
  * merge them back (measured 2.2 s for the two gopher queries at
  * sf0.1). This expression IS codegen (`doGenCode`), so the struct is
  * computed once and downstream `getField` ratio arithmetic CSEs onto
  * it.
  *
  * Parity contracts (validated in TextAnalysisSpec against the Column
  * reference formulation `gopherRulesColumns`):
  *  - tokenization quirks identical to [[TextStats.compute]] (space-
  *    only trim, `\s+` split with leading/trailing empty tokens), with
  *    ONE divergence mirrored from the Column gate: trim-empty text
  *    reports 0 words (the gate's explicit CASE), not the `['']`
  *    1-token quirk;
  *  - symbols = count of `#` codepoints plus leftmost non-overlapping
  *    `...`-or-`…` matches (exactly two independent `regexp_count`s);
  *  - lines = `split(text, "\n")` with trailing empties kept; a bullet
  *    line matches `^\s*[-*•]`, an ellipsis line `(\.\.\.|…)\s*$`;
  *  - stop hits are DISTINCT list members present (the
  *    `array_intersect` semantics), not occurrence counts.
  */
case class GopherStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = GopherStats.schema

  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    stops.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String].toString, stopIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("stopIdx", stopIdx, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.GopherStats.compute($input.toString(), $mapRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("token_len_sum", LongType, nullable = false),
    StructField("symbols", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("bullet_lines", IntegerType, nullable = false),
    StructField("ellipsis_lines", IntegerType, nullable = false),
    StructField("alpha_words", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  private def isWs(c: Int): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def isAlpha(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isBullet(c: Int): Boolean =
    c == '-' || c == '*' || c == 0x2022 // •

  /** Called from interpreted eval and generated code. Codepoint-based
    * like TextStats (length parity with both engines). */
  def compute(s: String, stopIdx: java.util.HashMap[String, Integer]): InternalRow = {
    val cps: Array[Int] = s.codePoints().toArray
    val len = cps.length

    // ---- tokens (space-only trim, \s+ split, trim-empty ⇒ 0 words) ----
    var tokens = 0
    var tokenLenSum = 0L
    var alphaWords = 0
    val stopSeen = new Array[Boolean](stopIdx.size())
    var start = 0
    var end = len
    while (start < end && cps(start) == ' ') start += 1
    while (end > start && cps(end - 1) == ' ') end -= 1
    if (end > start) {
      if (isWs(cps(start))) tokens += 1 // leading \s run ⇒ [""] prefix token
      var i = start
      var tokStart = -1
      var tokHasAlpha = false
      while (i <= end) {
        val atWs = i == end || isWs(cps(i))
        if (!atWs && tokStart < 0) { tokStart = i; tokHasAlpha = false }
        if (!atWs && isAlpha(cps(i))) tokHasAlpha = true
        if (atWs && tokStart >= 0) {
          tokens += 1
          tokenLenSum += (i - tokStart)
          if (tokHasAlpha) alphaWords += 1
          val idx = stopIdx.get(new String(cps, tokStart, i - tokStart))
          if (idx != null) stopSeen(idx) = true
          tokStart = -1
        }
        i += 1
      }
      if (isWs(cps(end - 1))) tokens += 1 // trailing \s run ⇒ [""] suffix token
    }
    var stopHits = 0
    var si = 0
    while (si < stopSeen.length) { if (stopSeen(si)) stopHits += 1; si += 1 }

    // ---- symbols: '#' count + leftmost non-overlapping ...|… ----
    var symbols = 0
    var i = 0
    while (i < len) { if (cps(i) == '#') symbols += 1; i += 1 }
    i = 0
    while (i < len) {
      if (cps(i) == '.' && i + 2 < len && cps(i + 1) == '.' && cps(i + 2) == '.') {
        symbols += 1; i += 3
      } else if (cps(i) == 0x2026) { symbols += 1; i += 1 }
      else i += 1
    }

    // ---- lines: \n split with trailing empties kept ----
    var nLines = 0
    var bulletLines = 0
    var ellipsisLines = 0
    var lineStart = 0
    i = 0
    while (i <= len) {
      if (i == len || cps(i) == '\n') {
        nLines += 1
        // ^\s*[-*•]
        var j = lineStart
        while (j < i && isWs(cps(j))) j += 1
        if (j < i && isBullet(cps(j))) bulletLines += 1
        // (\.\.\.|…)\s*$
        var k = i
        while (k > lineStart && isWs(cps(k - 1))) k -= 1
        if ((k - lineStart >= 3 && cps(k - 1) == '.' && cps(k - 2) == '.' &&
              cps(k - 3) == '.') ||
            (k > lineStart && cps(k - 1) == 0x2026)) ellipsisLines += 1
        lineStart = i + 1
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      tokens, tokenLenSum, symbols, nLines, bulletLines, ellipsisLines,
      alphaWords, stopHits))
  }

  /** Column-API entry point. */
  def stats(text: Column, stops: Seq[String]): Column =
    Bridge.column(GopherStats(Bridge.expression(text), stops))
}
