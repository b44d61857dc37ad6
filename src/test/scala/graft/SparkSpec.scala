package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (sbt forks one test JVM; getOrCreate
  * reuses the session, so no per-suite stop).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Sessions.builder("local[4]", 4).appName("graft-test").getOrCreate()

  def sf(dir: String): String = s"/root/testdata/$dir"
}
