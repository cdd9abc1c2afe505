package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = Engine.session("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}
