package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** All sign-LSH table buckets of a vector in ONE pass.
  *
  * Why it exists: the compositional formulation —
  * `array(table₀…table₃₁)` where each table is a `reduceLeft` of
  * `when(dot(v, plane) >= 0, 1, 0)` over its planes — is a single
  * expression tree of ~100 dot products. Catalyst cannot split ONE
  * expression across generated methods (`splitExpressions` works at
  * projection granularity), so the generated method blows past the
  * JIT's ~8 KB bytecode ceiling and runs as interpreted bytecode:
  * ~0.5 ms/row at 64 dims × 32 tables — the profiled bottleneck of the
  * ANN family. This expression emits one nested loop (~200 bytes of
  * bytecode), which the JIT compiles and vectorizes.
  *
  * Semantics (bit-for-bit equal to the compositional form): for table t,
  * bucket = Σⱼ sign-bit(v · planes[t*bits+j]) packed MSB-first, dots
  * accumulated sequentially in double precision. Output
  * `array<int>` of length `numTables`; null vector → null.
  *
  * `planesFlat` is row-major (plane index × dim), a Seq so that equal
  * plane sets make semantically-equal expressions (Array would compare
  * by reference and defeat ReuseExchange across identically-built
  * plans).
  */
case class HyperplaneBuckets(child: Expression, planesFlat: Seq[Double],
    numTables: Int, bitsPerTable: Int) extends UnaryExpression {

  private def numPlanes = numTables * bitsPerTable
  private def dim: Int = {
    require(numPlanes > 0 && planesFlat.length % numPlanes == 0,
      s"planesFlat length ${planesFlat.length} not divisible by $numTables×$bitsPerTable planes")
    planesFlat.length / numPlanes
  }

  @transient private lazy val flat: Array[Double] = planesFlat.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = dim
    if (v.numElements() != d) {
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${v.numElements()} dims, planes expect $d")
    }
    val out = new Array[Int](numTables)
    var p = 0
    var t = 0
    while (t < numTables) {
      var b = 0
      var j = 0
      while (j < bitsPerTable) {
        var s = 0.0
        var i = 0
        val base = p * d
        while (i < d) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += flat(base + i) * x
          i += 1
        }
        b = (b << 1) | (if (s >= 0) 1 else 0)
        j += 1
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
      val d = dim
      val getter = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector has " + $v.numElements() + " dims, planes expect $d");
         |}
         |int[] $out = new int[$numTables];
         |int $p = 0;
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $b = 0;
         |  for (int $j = 0; $j < $bitsPerTable; $j++) {
         |    double $s = 0.0;
         |    int $base = $p * $d;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $s += $planesRef[$base + $i] * ($getter($i));
         |    }
         |    $b = ($b << 1) | ($s >= 0 ? 1 : 0);
         |    $p++;
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object LshExpressions {
  /** All `numTables` sign-LSH buckets of `vec` as `array<int>`; planes
    * row-major as produced by `Similarity.hyperplanes`. */
  def hyperplaneBuckets(vec: Column, planes: Array[Array[Double]],
      numTables: Int, bitsPerTable: Int): Column = {
    require(planes.length == numTables * bitsPerTable,
      s"expected ${numTables * bitsPerTable} planes, got ${planes.length}")
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec),
      planes.flatten.toIndexedSeq, numTables, bitsPerTable))
  }
}
