package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType}

/** Native Catalyst expression for the double-precision dot product of
  * two numeric array columns.
  *
  * Why it exists: Spark's higher-order functions (`zip_with` +
  * `aggregate`) express the same computation but are NOT whole-stage-
  * codegen'd — each lambda step allocates and interprets, which turns a
  * 64-float FMA loop into microseconds instead of nanoseconds. On a
  * pairwise similarity join that loop is the hot path (millions of
  * evaluations), so this is exactly the case the engine's design rules
  * reserve for a custom `Expression` with `doGenCode`: the generated
  * Java is a tight primitive loop that the JIT vectorizes.
  *
  * Semantics (both eval paths, identical to the DuckDB oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`): cast each element to
  * double, multiply, accumulate sequentially left-to-right. Null arrays
  * propagate null; null ELEMENTS are not supported (returns whatever
  * the underlying ArrayData yields) — callers guarantee dense vectors.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  private def supportedElem(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false // short/byte/decimal: no getter implemented below
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if supportedElem(l) && supportedElem(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of float/double/int/long, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product_double"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) {
      // silent truncation would mask dimension bugs (e.g. 64 hyperplane
      // weights dotted against 128-dim vectors) — fail loudly instead
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch ${x.numElements()} vs ${y.numElements()}")
    }
    val n = x.numElements()
    val lt = elemType(left)
    val rt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = lt match {
        case FloatType  => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case IntegerType => x.getInt(i).toDouble
        case LongType   => x.getLong(i).toDouble
        case _ => throw new UnsupportedOperationException(s"element type $lt")
      }
      val yv = rt match {
        case FloatType  => y.getFloat(i).toDouble
        case DoubleType => y.getDouble(i)
        case IntegerType => y.getInt(i).toDouble
        case LongType   => y.getLong(i).toDouble
        case _ => throw new UnsupportedOperationException(s"element type $rt")
      }
      s += xv * yv
      i += 1
    }
    s
  }

  private def getter(tpe: DataType, arr: String, idx: String): String = tpe match {
    case FloatType   => s"(double) $arr.getFloat($idx)"
    case DoubleType  => s"$arr.getDouble($idx)"
    case IntegerType => s"(double) $arr.getInt($idx)"
    case LongType    => s"(double) $arr.getLong($idx)"
    case other => throw new UnsupportedOperationException(s"element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product_double: array length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API entry point: `dotDouble(a, b)` ≡ Σ aᵢ·bᵢ in double. */
  def dotDouble(a: Column, b: Column): Column =
    Bridge.column(DotProductDouble(Bridge.expression(a), Bridge.expression(b)))
}
