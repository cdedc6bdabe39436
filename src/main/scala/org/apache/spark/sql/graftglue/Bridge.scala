package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ⇄ Expression bridge behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim lives in
  * an `org.apache.spark.sql` subpackage solely to re-export the two
  * conversions graft's custom Catalyst expressions need. No other
  * internal API is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame whose LOGICAL plan is a leaf (`LogicalRDD`) over the
    * given InternalRow RDD — the lineage cut `localCheckpoint` performs,
    * exposed for [[graft.Reuse]]'s persist mode (where the cache must
    * keep serving reads but the logical plan must stop nesting).
    * `internalCreateDataFrame` is `private[sql]`; this shim lives under
    * `org.apache.spark.sql` solely to re-export it. */
  def fromRows(spark: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
