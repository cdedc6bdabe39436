package graft.tools
import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode
object AllPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("plans", "8")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.explainString(FormattedMode)
        val joins = "CartesianProduct|BroadcastNestedLoopJoin|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
          .findAllIn(p).toList.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }.mkString(",")
        val exchanges = "Exchange".r.findAllIn(p).size
        println(f"$name%-28s joins[$joins] exchanges=$exchanges")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
