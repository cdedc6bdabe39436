package graft.expressions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact HTTP message body decode for crawl `response` payloads
  * (`Warc.documentsFrame`): split the raw message at the FIRST CRLF
  * CRLF (byte positions — headers are ISO-8859-1 per RFC 9110, so the
  * char/byte offset identity holds), honor `Content-Encoding`
  * (gzip/x-gzip via the member-exact RFC 1952 decoder shared with the
  * .warc.gz container path, deflate as zlib with the raw-stream
  * fallback the HTTP ecosystem requires), then resolve the charset:
  * the `Content-Type` charset parameter first, a `<meta charset=...>`
  * sniff over the first 2 KiB of the decoded body second, and the
  * UTF-8-strict-else-windows-1252 heuristic last (UTF-8 is self-
  * validating; windows-1252 is the WHATWG legacy default). A declared-
  * but-wrong charset or an undecodable encoding yields a NULL text
  * with `error` set — the quarantine posture, never mojibake silently
  * corrupting dedup digests and quality gates downstream.
  *
  * Why an expression: decompression and strict charset trial are not
  * expressible in column algebra, and a codegen'd expression keeps the
  * decode inside the whole-stage span in the same task that parsed the
  * WARC file — payload bytes never shuffle. Output struct:
  * (text, charset, content_encoding, error), all nullable; `charset`
  * is the charset USED (or attempted, on a charset failure), NULL when
  * decompression already failed. */
case class HttpBodyDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs binary, got $t")
  }

  override def dataType: DataType = HttpBodyDecode.schema

  override def prettyName: String = "http_body_decode"

  override protected def nullSafeEval(input: Any): Any =
    HttpBodyDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.HttpBodyDecode.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): HttpBodyDecode =
    copy(child = newChild)
}

object HttpBodyDecode {

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("content_encoding", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private val MetaCharset = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]+charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")
  private val HeaderCharset = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")

  private def row(text: String, charset: String, cenc: String,
      error: String): InternalRow =
    new GenericInternalRow(Array[Any](
      if (text == null) null else UTF8String.fromString(text),
      if (charset == null) null else UTF8String.fromString(charset),
      if (cenc == null) null else UTF8String.fromString(cenc),
      if (error == null) null else UTF8String.fromString(error)))

  private def strictDecode(b: Array[Byte], cs: Charset): String =
    try cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
      .decode(ByteBuffer.wrap(b)).toString
    catch { case _: CharacterCodingException => null }

  private def lenientDecode(b: Array[Byte], cs: Charset): String =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(ByteBuffer.wrap(b)).toString

  /** HTTP deflate: zlib-wrapped per the RFC, but raw deflate streams
    * are common in the wild — try zlib first, raw on failure. Null on
    * an undecodable stream. */
  private def inflate(b: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(b)
        val out = new ByteArrayOutputStream(math.max(64, b.length * 4))
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return null }
          if (n > 0) out.write(buf, 0, n)
          else if (!inf.finished()) return null // truncated stream
        }
        out.toByteArray
      } finally inf.end()
    }
    val z = run(raw = false)
    if (z != null) z else run(raw = true)
  }

  /** First `field:` header line's value, trimmed; null when absent.
    * Case-insensitive field names per RFC 9110. */
  private def headerValue(header: String, field: String): String = {
    val lines = header.split("\r\n")
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val c = l.indexOf(':')
      if (c > 0 && l.substring(0, c).trim
          .equalsIgnoreCase(field)) return l.substring(c + 1).trim
      i += 1
    }
    null
  }

  /** Called from interpreted eval and generated code. */
  def compute(payload: Array[Byte]): InternalRow = {
    // first CRLF CRLF, byte positions (bodies may embed their own)
    var hdrEnd = -1
    var i = 0
    while (hdrEnd < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') hdrEnd = i
      i += 1
    }
    val header = new String(payload, 0,
      if (hdrEnd < 0) payload.length else hdrEnd, ISO_8859_1)
    val bodyRaw =
      if (hdrEnd < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, hdrEnd + 4, payload.length)

    val cencHdr = headerValue(header, "content-encoding")
    val cenc = if (cencHdr == null) null
      else cencHdr.toLowerCase(java.util.Locale.ROOT)
    val body: Array[Byte] = cenc match {
      case null | "identity" => bodyRaw
      case "gzip" | "x-gzip" =>
        val g = graft.sources.Warc.gunzipMembers(bodyRaw)
        if (g.error != null) null else g.data
      case "deflate" => inflate(bodyRaw)
      case _ => null
    }
    if (body == null) {
      val why = if (cenc != "gzip" && cenc != "x-gzip" && cenc != "deflate")
        s"unsupported content-encoding: $cenc"
      else s"content-encoding decode failed: $cenc"
      return row(null, null, cenc, why)
    }

    // declared charset: Content-Type param, then a <meta> sniff over
    // the first 2 KiB (meta tags are ASCII — latin1 view is safe)
    var declared: String = null
    val ctype = headerValue(header, "content-type")
    if (ctype != null) {
      val m = HeaderCharset.matcher(ctype)
      if (m.find()) declared = m.group(1)
    }
    if (declared == null) {
      val prefix = new String(body, 0, math.min(body.length, 2048), ISO_8859_1)
      val m = MetaCharset.matcher(prefix)
      if (m.find()) declared = m.group(1)
    }
    if (declared != null) {
      val name = declared.toLowerCase(java.util.Locale.ROOT)
      val cs =
        try Charset.forName(name)
        catch { case _: IllegalArgumentException => null }
      if (cs == null)
        return row(null, name, cenc, s"unsupported charset: $name")
      val t = strictDecode(body, cs)
      if (t == null)
        return row(null, name, cenc, s"charset decode failed: $name")
      return row(t, name, cenc, null)
    }
    // no declaration: UTF-8 is self-validating; windows-1252 is the
    // WHATWG legacy fallback (lenient — its 5 unmapped code points
    // must not fail the default path)
    val t8 = strictDecode(body, java.nio.charset.StandardCharsets.UTF_8)
    if (t8 != null) row(t8, "utf-8", cenc, null)
    else row(lenientDecode(body, Charset.forName("windows-1252")),
      "windows-1252", cenc, null)
  }

  val plainSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("charset", StringType, nullable = false)))

  /** The SAME no-declaration charset heuristic for a PLAIN text
    * payload (no HTTP envelope — WET `conversion` records): strict
    * UTF-8 trial, windows-1252 lenient fallback, charset reporting
    * which path decoded. Called from [[PlainTextDecode]]'s interpreted
    * eval and generated code. */
  def computePlain(payload: Array[Byte]): InternalRow = {
    val t8 = strictDecode(payload, java.nio.charset.StandardCharsets.UTF_8)
    val (t, cs) =
      if (t8 != null) (t8, "utf-8")
      else (lenientDecode(payload, Charset.forName("windows-1252")),
        "windows-1252")
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(t), UTF8String.fromString(cs)))
  }
}

/** Strict charset resolution for plain-text payloads — the WET
  * `conversion` counterpart of [[HttpBodyDecode]]'s no-declaration
  * path. Spark's lenient `decode(payload, 'UTF-8')` silently replaces
  * malformed bytes with U+FFFD while reporting charset='utf-8' —
  * mojibake feeding dedup digests and quality gates; here UTF-8 is
  * TRIED strictly (it is self-validating) and a failing payload falls
  * back to windows-1252 with the charset column saying so, matching
  * the response path's posture. Output struct: (text, charset). */
case class PlainTextDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs binary, got $t")
  }

  override def dataType: DataType = HttpBodyDecode.plainSchema

  override def prettyName: String = "plain_text_decode"

  override protected def nullSafeEval(input: Any): Any =
    HttpBodyDecode.computePlain(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.HttpBodyDecode.computePlain($input);")

  override protected def withNewChildInternal(newChild: Expression): PlainTextDecode =
    copy(child = newChild)
}
