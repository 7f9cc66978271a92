package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test fixture: one local session per JVM, graft functions
  * registered. Suites extend this instead of building their own session.
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.getOrCreate("local[4]")
  lazy val sf0001 = "/root/testdata/sf0.001"
  lazy val sf001 = "/root/testdata/sf0.01"
}
