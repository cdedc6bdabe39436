package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Reproduces the driver's smoke environment: a VANILLA SparkSession
  * (none of GraftSession's configs) calling SparkEntry.entry. */
object PlainSessionSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("plain-smoke").getOrCreate()
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    spark.stop()
  }
}
