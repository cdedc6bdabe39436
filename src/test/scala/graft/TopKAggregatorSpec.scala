package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("per-group top-k via aggregator equals the window reference on orders") {
    val orders = Tables.orders(spark, sf).filter(col("o_custkey") < 100)

    // aggregator path: one map-side-combined aggregation
    val aggUdf = udaf(TopKAggregator.topK(3))
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(aggUdf(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("e"))
      .select(col("o_custkey"), col("e._2").as("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // window reference (the oracle-checked shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("buffer logic: bounded, sorted, tie-break by smaller id") {
    val agg = TopKAggregator.topK(2)
    var buf = agg.zero
    Seq((5.0, 10L), (7.0, 3L), (5.0, 2L), (1.0, 1L)).foreach { e =>
      buf = agg.reduce(buf, e)
    }
    // top-2: (7.0,3), then tie at 5.0 broken by smaller id -> (5.0,2)
    assert(agg.finish(buf) === Seq((7.0, 3L), (5.0, 2L)))
  }

  test("merge is order-insensitive") {
    val agg = TopKAggregator.topK(3)
    val items = Seq((1.0, 1L), (9.0, 2L), (5.0, 3L), (7.0, 4L), (3.0, 5L))
    val (l, r) = items.splitAt(2)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) === agg.finish(agg.merge(b2, b1)))
    assert(agg.finish(agg.merge(b1, b2)) === Seq((9.0, 2L), (7.0, 4L), (5.0, 3L)))
  }
}
