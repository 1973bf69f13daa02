package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession per JVM across suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"

  /** Session-lifetime cache postcondition: after an operator's action
    * completes and its result frame is dropped, no persisted RDD blocks
    * may remain registered. Explicit persists must be unpersisted by the
    * operator itself (the Graph/bigramLm lesson); eager localCheckpoint
    * blocks are released by the ContextCleaner once unreferenced, which
    * GC forces here. Zero-cost on the (common) already-clean path. */
  def assertNoLeakedBlocks(clue: String, timeoutMs: Long = 30000): Unit = {
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis + timeoutMs
    while (sc.getPersistentRDDs.nonEmpty && System.currentTimeMillis < deadline) {
      System.gc()
      Thread.sleep(100)
    }
    val left = sc.getPersistentRDDs
    assert(left.isEmpty, s"$clue leaked ${left.size} persisted RDD(s): " +
      left.values.take(5).map(_.toString).mkString("; "))
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local(threads = 8)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
