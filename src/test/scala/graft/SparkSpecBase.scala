package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (Spark startup is the
  * dominant cost; every suite reuses it). Built through GraftSession so the
  * tests exercise the exact configuration (AQE, UTC, extensions) that
  * Verify/Bench run with.
  */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
