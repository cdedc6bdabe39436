package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, tag-aware HTML link scanner — the extraction engine
  * behind [[graft.functions.UrlOps.extractOutlinks]] /
  * `extractAnchors`. One walk over the document replaces the former
  * stack of whole-document regex passes (strip `<base>`, two quoted
  * href/src extracts, two anchor-pair extracts, base-href extract) and
  * closes their known false positives: quoted `href=`/`src=` sequences
  * inside HTML comments, `<script>`/`<style>` bodies, or visible TEXT
  * are not links (the attribute must occur inside a real tag), and a
  * `<base href>` inside a comment cannot hijack resolution.
  *
  * Contract (pinned by UrlOpsSpec and the q_outlinks/q_anchor_* oracle
  * fixtures):
  *  - quoted `href`/`src` attribute values of real tags, in document
  *    order; unquoted values are not extracted; `data-href`/`ng-src`
  *    etc. are not links (exact attribute-name match);
  *  - `<script src=...>` IS a link (the tag's own attributes count;
  *    only the element BODY is skipped);
  *  - the FIRST `<base href>` (nonempty, outside comments) is reported
  *    separately and never emitted as a ref;
  *  - each `<a href=...>...</a>` additionally carries its anchor text:
  *    inner markup → one space, whitespace collapsed, trimmed; links
  *    inside the anchor body still extract as plain refs; an `<a>`
  *    never closed yields a ref with a NULL anchor.
  *
  * Why an expression: the scan is the crawl tier's hottest projection
  * (every fetched page), and a codegen'd single pass keeps it inside
  * the whole-stage span in the task that decoded the page — document
  * bytes never shuffle. Output struct:
  * (base string, refs array<struct<ref string, anchor string>>). */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs string, got $t")
  }

  override def dataType: DataType = HtmlLinks.schema

  override def prettyName: String = "html_links"

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.HtmlLinks.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

object HtmlLinks {

  val schema: StructType = StructType(Seq(
    StructField("base", StringType, nullable = true),
    StructField("refs", ArrayType(StructType(Seq(
      StructField("ref", StringType, nullable = false),
      StructField("anchor", StringType, nullable = true))),
      containsNull = false), nullable = false)))

  /** Collapse whitespace runs to one space and trim — the anchor-text
    * normalization (markup was already replaced by single spaces). */
  private def collapse(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var k = 0
    var inWs = true // leading whitespace trims
    while (k < sb.length) {
      val ch = sb.charAt(k)
      if (Character.isWhitespace(ch)) {
        if (!inWs) { out.append(' '); inWs = true }
      } else { out.append(ch); inWs = false }
      k += 1
    }
    if (out.length > 0 && out.charAt(out.length - 1) == ' ')
      out.setLength(out.length - 1)
    out.toString
  }

  /** Called from interpreted eval and generated code. */
  def compute(html: UTF8String): InternalRow = {
    val s = html.toString
    val n = s.length
    val refs = new scala.collection.mutable.ArrayBuffer[Array[Any]]()
    var base: String = null
    var anchorIdx = -1 // refs index awaiting its anchor text
    var text: java.lang.StringBuilder = null
    var i = 0

    def appendSpace(): Unit = if (anchorIdx >= 0) text.append(' ')

    // case-insensitive indexOf for the script/style close scan
    def indexOfCI(target: String, from: Int): Int = {
      val m = target.length
      var k = from
      while (k + m <= n) {
        var j = 0
        while (j < m &&
          Character.toLowerCase(s.charAt(k + j)) == target.charAt(j)) j += 1
        if (j == m) return k
        k += 1
      }
      -1
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') {
        if (anchorIdx >= 0) text.append(c)
        i += 1
      } else if (s.startsWith("<!--", i)) {
        // comment: nothing inside is a link, a base, or anchor text;
        // an unterminated comment swallows the rest (browser behavior)
        appendSpace()
        val e = s.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else {
        var j = i + 1
        val closing = j < n && s.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
        if (j == nameStart) {
          // not a tag ("a < b", <!DOCTYPE, <?xml): a literal character
          if (anchorIdx >= 0) text.append(c)
          i += 1
        } else {
          val name = s.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          if (closing) {
            val gt = s.indexOf('>', j)
            if (name == "a" && anchorIdx >= 0) {
              refs(anchorIdx)(1) = UTF8String.fromString(collapse(text))
              anchorIdx = -1
              text = null
            } else appendSpace()
            i = if (gt < 0) n else gt + 1
          } else {
            appendSpace()
            // attribute walk, quote-aware ('>' inside a quoted value
            // does not close the tag)
            var k = j
            var firstHref = -1
            var endTag = false
            while (!endTag && k < n) {
              val ch = s.charAt(k)
              if (ch == '>') { endTag = true; k += 1 }
              else if (Character.isWhitespace(ch) || ch == '/' || ch == '=') k += 1
              else {
                val as = k
                while (k < n && !Character.isWhitespace(s.charAt(k)) &&
                  s.charAt(k) != '=' && s.charAt(k) != '>' &&
                  s.charAt(k) != '/') k += 1
                val aname = s.substring(as, k)
                  .toLowerCase(java.util.Locale.ROOT)
                while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
                var value: String = null
                if (k < n && s.charAt(k) == '=') {
                  k += 1
                  while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
                  if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
                    val qc = s.charAt(k)
                    val ve = s.indexOf(qc, k + 1)
                    if (ve < 0) k = n // unterminated quote: value dropped
                    else { value = s.substring(k + 1, ve); k = ve + 1 }
                  } else {
                    // unquoted value: consumed but NOT a link (the
                    // pinned extraction contract is quoted-only)
                    while (k < n && !Character.isWhitespace(s.charAt(k)) &&
                      s.charAt(k) != '>') k += 1
                  }
                }
                if (value != null && (aname == "href" || aname == "src")) {
                  if (name == "base") {
                    if (aname == "href" && base == null && value.nonEmpty)
                      base = value // first <base href> wins; never a ref
                  } else {
                    refs += Array[Any](UTF8String.fromString(value), null)
                    if (name == "a" && aname == "href" &&
                      anchorIdx < 0 && firstHref < 0)
                      firstHref = refs.length - 1
                  }
                }
              }
            }
            if (firstHref >= 0) {
              anchorIdx = firstHref
              text = new java.lang.StringBuilder
            }
            i = k
            if (name == "script" || name == "style") {
              // skip the element body (the tag's own src attr above
              // still counted); the closer re-enters the main loop
              appendSpace()
              val close = indexOfCI("</" + name, i)
              i = if (close < 0) n else close
            }
          }
        }
      }
    }
    // EOF with an open <a>: its href stays a plain ref (NULL anchor)
    val arr = new GenericArrayData(
      refs.map(a => new GenericInternalRow(a): Any).toArray)
    new GenericInternalRow(Array[Any](
      if (base == null) null else UTF8String.fromString(base), arr))
  }
}
