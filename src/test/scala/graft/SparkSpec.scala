package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession per JVM across suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local(threads = 8)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
