package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Stage breakdown for editDistancePairs — manual:
  *   sbt "runMain graft.tools.EditProfile /root/testdata/sf0.1"
  */
object EditProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-editprofile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"[edit] $name%-28s n=$n%8d  run1 ${(t1 - t0) / 1e9}%6.2f s  run2 ${(t2 - t1) / 1e9}%6.2f s")
    }

    val part = Tables.part(spark, dir).select("p_name")
    t("raw rows")(part.count())
    val strs = part.select(col("p_name").cast("string").as("s"))
      .na.drop().distinct()
    t("distinct strings")(strs.count())
    val full = Dedup.editDistancePairs(part, "p_name", 2)
    t("full pairs")(full.count())
    val t0 = System.nanoTime()
    println("[edit] plan:\n" + full.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    println(f"[edit] explain took ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    spark.stop()
  }
}
