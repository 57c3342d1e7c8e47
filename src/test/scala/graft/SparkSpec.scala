package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * whole `sbt test` run fast). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
  // the driver's correctness scale — for specs whose fixture partition is
  // empty at sf0.001
  val sf01: String = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
  def sf01: String = TestSpark.sf01
}
