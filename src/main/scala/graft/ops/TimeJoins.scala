package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bounded equi-joins (SURVEY.md §2 A12 — the reference's
  * `JoinWindows.of(1000)` stream-stream join,
  * reference: pipeline/src/test/kotlin/integrationtests/KafkaIntelligencePipelineTests.kt:272-275).
  *
  * Batch form: an equi-join on the key plus a range predicate on exact
  * Long event-time. Catalyst plans this as a shuffled join on the equi key
  * with the range as a post-join filter — the scalable shape, since the
  * equi key carries the partitioning. Never express this as a pure range
  * (theta) join: that degenerates to BroadcastNestedLoop.
  */
object TimeJoins {

  /** Pairs (a, b) with equal `key` and `b.ts` in `(a.ts + lowerNs, a.ts + upperNs]`.
    * Column names of `right` get the given prefix to avoid ambiguity. */
  def withinWindow(left: DataFrame, right: DataFrame, key: String, ts: String,
      lowerNs: Long, upperNs: Long, rightPrefix: String = "b_"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    left.join(r,
      col(key) === col(rightPrefix + key) &&
        col(rightPrefix + ts) > col(ts) + lit(lowerNs) &&
        col(rightPrefix + ts) <= col(ts) + lit(upperNs))
  }
}
