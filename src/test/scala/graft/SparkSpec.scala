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
  // optimizer/session tuning the engine ships with.
  lazy val session: SparkSession = GraftSession.getOrCreate("local[4]", 4)
}
