package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs — one JVM-wide SparkSession (local[4, 2]:
  * one task retry allowed, so fault-tolerance claims like the keyed sink's
  * retry idempotence are testable under the execution mode they target).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.local(cores = 4, appName = "graft-test",
      maxTaskFailures = 2)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}
