package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session across suites (one JVM via Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test")
}

trait SparkSpecBase extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Encoders/implicits bound to the shared test session. */
  val testImplicits = TestSpark.spark.implicits

  def fixturePath(rel: String): String = {
    val url = getClass.getResource(s"/reference_fixtures/$rel")
    assert(url != null, s"missing fixture $rel")
    url.getPath
  }
}
