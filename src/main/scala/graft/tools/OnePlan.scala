package graft.tools
import graft.{GraftSession, SparkEntry}
/** Dump the formatted physical plan of one registered query:
  * runMain graft.tools.OnePlan <query> [sfDir]. */
object OnePlan {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("oneplan", "8")
    println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
