package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY.md §2 A13 — the reference's
  * `SessionWindows.with(500000)` aggregate,
  * reference: pipeline/src/test/kotlin/integrationtests/KafkaIntelligencePipelineTests.kt:325-333).
  *
  * Batch path: lag + running-sum session ids over integer event-time.
  * Works on exact Long timestamps (nanos) so results are deterministic and
  * bit-match a SQL oracle — unlike `session_window()` which needs a
  * TimestampType (µs) cast.
  *
  * Scale: one shuffle on the session key; the within-partition sort is the
  * unavoidable cost of sessionization (same as Spark's own
  * `session_window` physical plan). Skewed keys: pre-filter hot keys or
  * let AQE split; state never accumulates (pure window functions).
  * Streaming path: see graft.streaming.StreamSessions (session_window +
  * watermark).
  */
object Sessions {

  /** Adds a 0-based `session_id` per key: a new session starts when the
    * gap since the previous event strictly exceeds `gapNs`. `tieBreak`
    * must make the per-key ordering total (unique id column). */
  def assignByGap(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val isNew = when(lag(ts, 1).over(w).isNull, lit(1))
      .when(ts - lag(ts, 1).over(w) > gap, lit(1))
      .otherwise(lit(0))
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - lit(1))
  }
}
