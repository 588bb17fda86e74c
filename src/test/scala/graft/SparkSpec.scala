package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs — one JVM-wide SparkSession (local[4, 2]:
  * one task retry allowed, so fault-tolerance claims like the keyed sink's
  * retry idempotence are testable under the execution mode they target).
  */
object TestSpark {
  private[this] var current: SparkSession = _

  /** The shared session, RE-CREATED if its SparkContext has been shut down
    * (round-20 driver record: one PropertySpec test died with "SparkContext
    * has been shutdown" mid-run — a session-lifecycle flake, not a logic
    * failure; with a plain `lazy val`, one context death cascades into every
    * suite that starts afterwards). getOrCreate alone is not enough: it
    * happily returns a session whose context is stopped.
    */
  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = graft.core.GraftSession.local(cores = 4,
        appName = "graft-test", maxTaskFailures = 2)
    }
    current
  }
}

trait SparkSpec extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable identifier.
  // Each suite re-checks liveness at ITS first access, so a context death in
  // one suite no longer fails every suite after it.
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}
