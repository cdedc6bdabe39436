package graft.tools
import graft.{GraftSession, SparkEntry}
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("plans", "8")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_raw_events", "q3_shipping", "q5_region_revenue", "q_embedding_neardup", "q1_lineitem_agg")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
