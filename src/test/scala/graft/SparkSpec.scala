package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM — sbt Test/fork). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Retry an assertion block until it passes (async listener callbacks
    * land on their own schedule) — up to ~5 s. */
  def eventually[T](body: => T): T = {
    var last: Throwable = null
    for (_ <- 1 to 50) {
      try return body
      catch { case t: org.scalatest.exceptions.TestFailedException => last = t; Thread.sleep(100) }
    }
    throw last
  }
}
