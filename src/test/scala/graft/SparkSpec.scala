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

  /** Driver-side replica of TextFunctions.md5Int (first 15 md5 hex chars
    * as a 60-bit long) — ONE copy for every spec's sampling replays, so a
    * width/semantics change to the engine helper breaks tests here
    * instead of silently pinning stale replicas. */
  def md5IntLocal(t: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
}
