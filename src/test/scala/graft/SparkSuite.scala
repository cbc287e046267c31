package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared across every suite in the forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
