package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI'11): a D-dim unit vector is cut
  * into `m` subvectors of D/m dims; each subvector is replaced by the
  * index of its nearest codeword among `ksub` per-subspace centroids.
  * A vector becomes `m` small integers — 64 float32 dims (256 bytes)
  * compress to 8 bytes at m=8/ksub=256 — and asymmetric distances
  * (query in the clear vs quantized corpus) are sums of per-subspace
  * codeword distances.
  *
  * Both kernels follow the `TopCentroids` pathology fix: a
  * compositional m × ksub × dsub expression tree cannot be split by
  * Catalyst across generated methods and would blow the JIT bytecode
  * ceiling; here codegen routes through the expression instance
  * (`addReferenceObj`), so the nested loops run as compiled JVM code
  * with the codebooks resident as one flat double[].
  *
  * Both kernels L2-NORMALIZE the float vector inline (divide by the
  * norm child) — PQ here serves COSINE search, and on unit vectors
  * cos(q, x) = 1 − ‖q − x‖²/2, so L2 codebooks/distances carry cosine
  * order exactly. Zero-norm vectors must be filtered upstream, like
  * every cosine operator in the family.
  */
object PqExpressions {

  /** Codebooks as one flat array: entry ((j·ksub) + c)·dsub + d is
    * dimension d of codeword c of subspace j. */
  private[graft] def flatten(codebooks: Array[Array[Array[Double]]]): (Seq[Double], Int, Int, Int) = {
    val m = codebooks.length
    require(m > 0, "need at least one subspace")
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
      s"ragged codebooks: expected uniform $m x $ksub x $dsub")
    (codebooks.flatten.flatten.toIndexedSeq, m, ksub, dsub)
  }

  /** PQ-encode `vec` (normalized by `vnorm`): array<int> of the m
    * nearest-codeword indices, ties to the smaller code. */
  def pqEncode(vec: Column, vnorm: Column,
      codebooks: Array[Array[Array[Double]]]): Column = {
    val (flat, m, ksub, dsub) = flatten(codebooks)
    Bridge.column(PqEncode(Bridge.expression(vec), Bridge.expression(vnorm),
      flat, m, ksub, dsub))
  }

  /** Asymmetric (ADC) squared L2 distance between the normalized query
    * `qvec`/`qnorm` and a PQ-coded corpus vector: Σⱼ ‖qⱼ − c_{j,codes[j]}‖². */
  def pqAdcDistance(codes: Column, qvec: Column, qnorm: Column,
      codebooks: Array[Array[Array[Double]]]): Column = {
    val (flat, m, ksub, dsub) = flatten(codebooks)
    Bridge.column(PqAdcDistance(Bridge.expression(codes), Bridge.expression(qvec),
      Bridge.expression(qnorm), flat, m, ksub, dsub))
  }
}

/** Children: (vec array<float|double>, vnorm double). Output:
  * array<int> of length m — codes[j] = argmin_c ‖vec/vnorm − c‖² over
  * subspace j's codewords, ties to the smaller code. */
case class PqEncode(left: Expression, right: Expression,
    codebooksFlat: Seq[Double], m: Int, ksub: Int, dsub: Int)
    extends BinaryExpression {

  @transient private lazy val flat: Array[Double] = codebooksFlat.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, double), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // hoisted out of the m×ksub×dsub loop: a def would re-run the
  // dataType cast once per element read
  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def evalWithNorm(v: ArrayData, vnorm: Double): ArrayData = {
    val d = m * dsub
    if (v.numElements() != d) {
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${v.numElements()} dims, codebooks expect $d")
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val base = ((j * ksub) + c) * dsub
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val x0 = if (isFloat) v.getFloat(j * dsub + i).toDouble
            else v.getDouble(j * dsub + i)
          val diff = x0 / vnorm - flat(base + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c } // strict < : ties keep the smaller code
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalWithNorm(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalWithNorm($v, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** Children: (codes array<int>, qvec array<float|double>, qnorm
  * double). Output: double — the ADC squared L2 distance between the
  * normalized query and the decoded corpus vector. A production
  * serving kernel precomputes the m × ksub lookup table once per query
  * and reads codes only; this expression computes the same sum
  * directly (the table unrolled), which keeps it stateless per row. */
case class PqAdcDistance(first: Expression, second: Expression, third: Expression,
    codebooksFlat: Seq[Double], m: Int, ksub: Int, dsub: Int)
    extends TernaryExpression {

  @transient private lazy val flat: Array[Double] = codebooksFlat.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType | DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<float|double>, double), got ($a, $b, $c)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  // hoisted out of the m×dsub scoring loop (see PqEncode)
  @transient private lazy val isFloat =
    second.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def evalDist(codes: ArrayData, q: ArrayData, qnorm: Double): Double = {
    if (codes.numElements() != m) {
      throw new IllegalArgumentException(
        s"$prettyName: ${codes.numElements()} codes, codebooks expect $m")
    }
    if (q.numElements() != m * dsub) {
      throw new IllegalArgumentException(
        s"$prettyName: query has ${q.numElements()} dims, codebooks expect ${m * dsub}")
    }
    var dist = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) {
        throw new IllegalArgumentException(
          s"$prettyName: code $c out of range [0, $ksub) in subspace $j")
      }
      val base = ((j * ksub) + c) * dsub
      var i = 0
      while (i < dsub) {
        val x0 = if (isFloat) q.getFloat(j * dsub + i).toDouble
          else q.getDouble(j * dsub + i)
        val diff = x0 / qnorm - flat(base + i)
        dist += diff * diff
        i += 1
      }
      j += 1
    }
    dist
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    evalDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, q, n) => {
      val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDistance].getName)
      s"${ev.value} = $self.evalDist($cs, $q, $n);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdcDistance =
    copy(first = newFirst, second = newSecond, third = newThird)
}
