package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM (suites run forked, sequentially). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
}
