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
