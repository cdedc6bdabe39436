package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting/range-partitioning by the interleaved key clusters rows that
  * are close in BOTH dimensions into the same files, so per-file
  * min/max statistics become selective for predicates on either
  * column — the standard lakehouse layout trick for two-column filter
  * workloads, where a linear sort gives selectivity on the leading
  * column only. (Morton 1966; the same layout DELTA's OPTIMIZE ZORDER
  * BY and Hudi's space-filling-curve clustering implement.)
  *
  * The interleave is the classic magic-number bit spread — five
  * shift-or-mask steps per dimension, all `Column` bitwise arithmetic:
  * whole-stage-codegen'd straight-line long math, no UDF, and each
  * step is mirrored verbatim in the DuckDB oracle so the 64-bit key is
  * hash-exact cross-engine. Inputs are taken as unsigned 32-bit
  * (masked); keys beyond 2³²−1 must be range-compressed first (at
  * 100 TB you z-order on bucketed/quantized coordinates anyway —
  * resolution beyond file granularity buys nothing).
  */
object ZOrder {

  private val steps: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `c` onto the even bit positions. */
  def spreadBits(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (shift, mask)) =>
        acc.bitwiseOR(shiftleft(acc, shift)).bitwiseAND(lit(mask))
    }

  /** 64-bit Morton key: bits of `x` on even positions, `y` on odd. */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The same interleave as a raw Catalyst tree — what the SQL-surface
    * `zorder_key` registration returns (a Column built from
    * `functions._` carries unresolved lazy nodes that the
    * `injectFunction` path cannot analyze). */
  private[graft] def zValueExpr(
      x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      BitwiseAnd, BitwiseOr, Cast, Expression, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    def spread(e: Expression): Expression =
      steps.foldLeft[Expression](
        BitwiseAnd(Cast(e, LongType), Literal(0xFFFFFFFFL))) {
        case (acc, (shift, mask)) =>
          BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(shift))),
            Literal(mask))
      }
    BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
  }

  /** Lay a table out in z-order: range-partition on the Morton key
    * (contiguous key ranges → one file reads a compact 2-D tile), then
    * sort within partitions so row-group stats are tight too. The key
    * column is internal; the written schema is unchanged. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1)
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
