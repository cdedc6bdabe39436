package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss random projection to `outDim` dimensions with
  * a HASH-DERIVED dense ±1 matrix — the standard cheap dimensionality
  * reduction before ANN indexing / clustering when the source
  * embeddings are wider than the distance signal needs:
  * `out[i] = (1/√outDim) · Σ_j sign(i·D + j) · v[j]`.
  *
  * The sign matrix is never materialized anywhere: entry (i, j) is
  * bit 16 of `(i·D + j) · 2654435761` (Knuth's multiplicative hash —
  * low product bits of k·odd are just k's parity, bit 16 mixes), so
  * every executor — and the DuckDB oracle — derives the same matrix
  * from integer arithmetic alone. No seed broadcast, no driver state,
  * nothing shuffles but the projected rows. ±1 entries (Achlioptas)
  * give the same JL distance-preservation guarantee as Gaussians.
  *
  * Why a codegen expression and not `transform(sequence(...),
  * aggregate(...))` Column HOFs: the HOF pair runs interpreted per
  * OUTPUT element — outDim × D lambda dispatches per row (the
  * CollapseProject/HOF trap) — while this is one tight JIT'd loop
  * nest inside whole-stage codegen.
  *
  * Parity: multiply and add are IEEE-exact per step and the j-loop
  * accumulates left-to-right like DuckDB's `list_sum(list_transform)`;
  * the final `/ √outDim` is correctly rounded on both engines. NULL
  * array elements contribute 0 (fixture embeddings have none; DuckDB's
  * list_sum likewise skips NULLs).
  */
case class RandomProject(child: Expression, outDim: Int)
    extends UnaryExpression {

  require(outDim > 0, s"need a positive output dimension, got $outDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "random_project"

  override protected def nullSafeEval(input: Any): Any =
    RandomProject.compute(input.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.RandomProject.compute($input, $outDim);")

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

object RandomProject {

  /** ±1 entry (i·D + j) of the implicit projection matrix. */
  def sign(k: Long): Double =
    if ((((k * 2654435761L) >>> 16) & 1L) == 0L) 1.0 else -1.0

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, outDim: Int): ArrayData = {
    val d = arr.numElements()
    val out = new Array[Double](outDim)
    val scale = Math.sqrt(outDim.toDouble)
    var i = 0
    while (i < outDim) {
      val base = i.toLong * d
      var s = 0.0
      var j = 0
      while (j < d) {
        if (!arr.isNullAt(j)) s += arr.getFloat(j) * sign(base + j)
        j += 1
      }
      out(i) = s / scale
      i += 1
    }
    new GenericArrayData(out)
  }

  def project(vec: Column, outDim: Int): Column =
    Bridge.column(RandomProject(Bridge.expression(vec), outDim))
}
