package graft

import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions

/** DotProductDouble: both eval paths, type checking, length mismatch. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot product is exact in double for float arrays") {
    val d = Seq((Array(1.5f, 2.0f, -3.0f), Array(2.0f, 0.5f, 1.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(d === 1.5 * 2.0 + 2.0 * 0.5 + (-3.0) * 1.0)
  }

  test("int and long element types are supported") {
    val d = Seq((Array(1, 2, 3), Array(4L, 5L, 6L))).toDF("a", "b")
      .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(d === 32.0)
  }

  test("null arrays propagate null") {
    val r = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("length mismatch fails loudly instead of truncating") {
    val ex = intercept[Exception] {
      Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
        .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("length mismatch"))))
  }

  test("unsupported element types are rejected at analysis time") {
    val ex = intercept[Exception] {
      Seq((Array(1.toShort), Array(1.toShort))).toDF("a", "b")
        .select(VectorExpressions.dotDouble(col("a"), col("b")).as("d"))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("float/double/int/long") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
