package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession per JVM across suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"

  /** Pre-action snapshot of registered persistent RDD ids — pair with
    * [[assertNoLeakedBlocks]] so a block leaked by an EARLIER suite (the
    * session is JVM-shared) is not misattributed to this test. */
  def snapshotBlocks(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Session-lifetime cache postcondition: after an operator's action
    * completes and its result frame is dropped, no persisted RDD blocks
    * NEWLY REGISTERED since `baseline` may remain. Explicit persists must
    * be unpersisted by the operator itself (the Graph/bigramLm lesson);
    * eager localCheckpoint blocks are released by the ContextCleaner once
    * unreferenced, which GC forces here. Zero-cost on the (common)
    * already-clean path. */
  def assertNoLeakedBlocks(clue: String, baseline: Set[Int] = Set.empty,
      timeoutMs: Long = 30000): Unit = {
    val sc = spark.sparkContext
    def leaked = sc.getPersistentRDDs.filter(kv => !baseline.contains(kv._1))
    val deadline = System.currentTimeMillis + timeoutMs
    while (leaked.nonEmpty && System.currentTimeMillis < deadline) {
      System.gc()
      Thread.sleep(100)
    }
    val left = leaked
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
