package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression —
  * canonical-composes text so that visually-identical strings compare,
  * hash, and dedup identically ("é" as U+00E9 vs "e"+U+0301 are
  * different bytes, different xxhash64 shingles, different exact-dedup
  * digests until normalized). Running it FIRST makes every downstream
  * byte-keyed operator (exact dedup, MinHash/SimHash shingles, term
  * counts) see one canonical form.
  *
  * Why a custom expression: Spark has no built-in normalizer (DuckDB
  * has `nfc_normalize`, which is the oracle twin). Why not a UDF: this
  * sits at the very start of a 100 TB text pipeline, and the
  * expression form keeps the projection inside whole-stage codegen
  * with two allocation-free fast paths:
  *  - pure-ASCII payloads (the overwhelming majority of a web corpus)
  *    are detected with a byte scan and returned AS-IS — no UTF-16
  *    decode, no allocation (the cost that sank the byte-scan rewrite
  *    of TextStats is never paid here);
  *  - non-ASCII but already-NFC text (most real UTF-8) passes
  *    `Normalizer.isNormalized` and returns the original UTF8String,
  *    allocating only the transient decode.
  *
  * Parity: the JDK's `java.text.Normalizer` and DuckDB's utf8proc both
  * implement UAX #15 canonical composition; they agree on every
  * assigned codepoint (divergence is possible only for codepoints
  * newer than one side's Unicode tables — not a property of fixture
  * or crawl text).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.NfcNormalize.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Called from both interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    // fast path 1: ASCII bytes are NFC by construction — no decode
    val n = u.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (u.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return u
    val s = u.toString
    // fast path 2: already-canonical non-ASCII text keeps its bytes
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}

/** Accent folding (diacritic removal) as a codegen'd Catalyst
  * expression: NFD-decompose, drop non-spacing marks (Unicode category
  * Mn), NFC-recompose. "café" → "cafe", "Đường" → "Đuong" (Đ carries a
  * stroke, not a combining mark — it survives, matching utf8proc), CJK
  * and fullwidth text pass through untouched.
  *
  * This is the canonicalization step BETWEEN `nfc_normalize` (which
  * preserves accents) and lowercasing in a dedup/matching pipeline:
  * accent-insensitive exact dedup, term counting, and fuzzy-join
  * blocking all want "café" and "cafe" in one bucket, and at 100 TB
  * that fold must happen inside the scan projection — same
  * whole-stage-codegen + ASCII-fast-path rationale as [[NfcNormalize]].
  *
  * Parity: DuckDB's `strip_accents` (utf8proc) is the oracle twin.
  * Both sides implement NFD → remove Mn → recompose over the same
  * Unicode tables; verified empirically over Latin/Greek/Cyrillic/
  * Vietnamese/CJK/fullwidth/ligature probes (all byte-identical) in
  * addition to the registered oracle query.
  */
case class FoldAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "fold_accents"

  override protected def nullSafeEval(input: Any): Any =
    FoldAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.FoldAccents.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

object FoldAccents {

  /** Called from both interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    // fast path: ASCII bytes carry no combining marks — no decode
    val n = u.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (u.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return u
    val s = u.toString
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    var dropped = false
    while (j < d.length) {
      val cp = d.codePointAt(j)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) dropped = true
      else sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    // nothing stripped → the NFC-recompose of the decomposition is the
    // canonical form of the input; keep the original bytes if they were
    // already canonical (the common already-NFC case allocates only the
    // transient decode, mirroring NfcNormalize's fast path 2)
    val out = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    if (!dropped && out == s) u else UTF8String.fromString(out)
  }

  def fold(text: Column): Column =
    Bridge.column(FoldAccents(Bridge.expression(text)))
}
