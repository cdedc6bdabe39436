package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array in ONE per-document pass.
  *
  * Replaces the distributed formulation — explode(tokens) → token hash →
  * 64 `sum(±1)` aggregates → bit pack — which is semantically identical
  * but (i) shuffles one row per token and (ii) sits under several
  * downstream joins whose differing output partitionings each recompute
  * the whole aggregate subtree (~3× at the profiled query shape). Here
  * the signature is a plain projected column: hash each token, walk its
  * 64 bits into ±1 counters, pack counter signs MSB-first (hash bit i →
  * signature bit 63-i, exactly the aggregate form's layout).
  *
  * Token hashes (bit-for-bit the Column-level forms in `Dedup`):
  *  - xxhash64, seed 42 — `xxhash64(t)`, the scale default;
  *  - portable 60-bit sha prefix — `conv(substring(sha2(t,256),1,15),16,10)`
  *    = the first 8 big-endian digest bytes `>>> 4`, mirrored by the
  *    DuckDB oracle.
  *
  * Null/empty token arrays yield NULL (the aggregate form simply has no
  * rows for such docs); null ELEMENTS throw — the upstream tokenizer
  * never produces them, and a silent ±1 convention would diverge from
  * the aggregate form's CaseWhen semantics.
  */
case class SimHash64(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  // MessageDigest is stateful and NOT thread-safe; expression instances
  // are shared across a stage's task threads via codegen reference objs
  @transient private lazy val sha: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  private def portableHash(t: UTF8String): Long = {
    val md = sha.get()
    md.reset()
    val d = md.digest(t.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4 // keep the first 15 hex digits = top 60 bits
  }

  /** Shared by both eval paths; returns java.lang.Long or null. */
  def hashTokens(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var idx = 0
    while (idx < n) {
      if (arr.isNullAt(idx)) {
        throw new IllegalArgumentException(
          s"$prettyName: null token at position $idx — tokenize before hashing")
      }
      val t = arr.getUTF8String(idx)
      val h =
        if (portable) portableHash(t)
        else XxHash64Function.hash(t, StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      idx += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << (63 - i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def eval(input: InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) null else hashTokens(c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the hot loop runs as compiled Scala behind a reference object —
    // generated-side code stays tiny regardless of token counts
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    val boxed = ctx.freshName("boxed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = $self.hashTokens(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashExpressions {
  /** 64-bit SimHash of a (distinct) token array; null for null/empty. */
  def simhash64(tokens: Column, portable: Boolean): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), portable))
}
