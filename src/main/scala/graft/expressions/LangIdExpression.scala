package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language identification: tokenize once, count marker-word
  * hits per language, return the argmax (ties break in declaration
  * order; zero hits ⇒ "und"; null text ⇒ null).
  *
  * Same rationale as `TextStats`: the Column formulation evaluates
  * `split(trim(text))` once per language filter (5 marker sets ⇒ ~10
  * tokenizations per row after CollapseProject inlining); this
  * expression scans the string once and probes a prebuilt token→langs
  * map. Tokenization semantics match `TextAnalysis.tokens` (space-only
  * trim, `\s+` splits), and marker words overlapping languages (e.g.
  * "la" in both es and fr) count for each.
  */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val table: LangId.Table = LangId.buildTable(markers)

  override protected def nullSafeEval(input: Any): Any =
    LangId.detect(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("langTable", table,
      "graft.expressions.LangId$Table")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.LangId.detect($input.toString(), $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** Prebuilt lookup: token → indexes of the languages listing it. */
  final class Table(
      val langs: Array[String],
      val tokenLangs: java.util.HashMap[String, Array[Int]])
    extends Serializable

  def buildTable(markers: Seq[(String, Seq[String])]): Table = {
    val langs = markers.map(_._1).toArray
    val m = new java.util.HashMap[String, Array[Int]]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      // distinct: a duplicated marker word inside one language's list
      // must count once per token occurrence, matching isInCollection
      words.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    new Table(langs, m)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B.toChar || c == '\f' || c == '\r'

  /** One tokenizing pass; called from interpreted eval and codegen. */
  def detect(s: String, table: Table): UTF8String = {
    val counts = new Array[Int](table.langs.length)
    val len = s.length
    var i = 0
    var tokStart = -1
    while (i <= len) {
      val atWs = i == len || isWs(s.charAt(i))
      if (!atWs && tokStart < 0) tokStart = i
      if (atWs && tokStart >= 0) {
        val hit = table.tokenLangs.get(s.substring(tokStart, i))
        if (hit != null) { var j = 0; while (j < hit.length) { counts(hit(j)) += 1; j += 1 } }
        tokStart = -1
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var k = 0
    while (k < counts.length) {
      if (counts(k) > best) { best = counts(k); bestIdx = k } // ties: first wins
      k += 1
    }
    UTF8String.fromString(if (bestIdx < 0) "und" else table.langs(bestIdx))
  }

  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangId(Bridge.expression(text), markers))
}
