package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * the forked test JVM). */
object TestSpark {
  /** 4 cores keeps the 43-suite run snappy; throughput measurements
    * (StreamThroughputSpec) override to the host width via
    * `-Dgraft.test.cpus=32` on the forked test JVM. */
  lazy val spark: SparkSession =
    GraftSession.local("graft-test", sys.props.getOrElse("graft.test.cpus", "4"))
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}
