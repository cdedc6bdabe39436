package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{GraftSession, Tables}

/** Decide-with-data probe for NOTES item "byte-level LangId/TextStats
  * scan": measures what fraction of the TextStats expression's per-row
  * cost is the `UTF8String → String → codePoints[]` decode that a
  * UTF-8-byte scanner would remove. NOT part of the driver contract;
  * run manually:
  *   sbt "runMain graft.tools.TextDecodeProfile /root/testdata/sf0.1"
  */
object TextDecodeProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-text-profile", "4")
    val texts: Array[UTF8String] = Tables.documents(spark, dir)
      .select(col("text")).collect()
      .map(r => UTF8String.fromString(r.getString(0)))
    println(s"[probe] ${texts.length} docs, " +
      s"${texts.map(_.numBytes.toLong).sum / texts.length} avg bytes")

    val stop = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to").foreach(stop.add)

    def time(label: String)(body: => Long): Unit = {
      // warmup then 5 timed reps; report the min (JIT-settled)
      (1 to 3).foreach(_ => body)
      val best = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val sink = body
        (System.nanoTime() - t0, sink)
      }.minBy(_._1)
      println(f"[probe] $label%-28s ${best._1 / 1e6}%8.1f ms  (sink ${best._2})")
    }

    time("full compute (current)") {
      var acc = 0L
      texts.foreach { u =>
        acc += graft.expressions.TextStats.compute(u.toString, stop)
          .getLong(4)
      }
      acc
    }
    time("decode only (toString+cps)") {
      var acc = 0L
      texts.foreach { u => acc += u.toString.codePoints().toArray.length }
      acc
    }
    time("toString only") {
      var acc = 0L
      texts.foreach(u => acc += u.toString.length)
      acc
    }
    spark.stop()
  }
}
