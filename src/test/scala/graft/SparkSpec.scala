package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  // The product session config (GraftSession) — specs must observe the same
  // optimizer/session tuning the engine ships with. local[4,2] = 4 threads
  // with spark.task.maxFailures=2 (plain local[N] pins maxFailures to 1),
  // so RetryLawsSpec can inject first-attempt task failures and assert the
  // retried run is bit-identical — the cluster regime, where task retries
  // are routine. Every other suite is unaffected: a deterministic failure
  // still fails the job, just after one extra attempt.
  //
  // A `def`, not a `lazy val` (round 12): LocalClusterSpec must STOP this
  // context to host its multi-JVM local-cluster context (one SparkContext
  // per JVM), then restore it. Suites run sequentially in the forked test
  // JVM and each suite caches its own `lazy val spark`, so resolving the
  // current session per suite is race-free; getOrCreate returns the live
  // session when one exists and re-creates it after a stop.
  def session: SparkSession = GraftSession.getOrCreate("local[4,2]", 4)
}
