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

  /** Ordered-funnel analysis — the MATCH_RECOGNIZE-shaped sequence
    * operator (SQL:2016 row-pattern matching; Flink CEP / funnel
    * analytics): per key, the earliest chain of `stages` events where
    * each stage strictly follows the previous one in time. The greedy
    * first-match fold over time-ordered events is exactly the
    * minimal-chain semantics (first s₁, then the first s₂ after it, …).
    *
    * Plan shape: ONE exchange (the per-key collect) and an in-aggregate
    * `array_sort` + expression `aggregate` fold — no per-stage self-join
    * cascade (k stages as joins would scan and shuffle the event table k
    * times), no window over the raw events. Repeated stage names work
    * (view→view→… counts re-occurrences). Per-key event lists must fit
    * in an aggregation buffer — at 100 TB shard pathological hot keys
    * first (Skew.scala), the same caveat as any per-entity collect.
    *
    * Returns per key: `stage` (completed prefix length) and `st`, the
    * array of per-stage timestamps (null = not reached). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 8, "1..8 funnel stages")
    stages.foreach(s => require(s.matches("[A-Za-z0-9_]+"), s"bad stage name: $s"))
    // Type-aware event time: a blind `cast(ts as long)` on a TIMESTAMP
    // column yields epoch-SECONDS — the funnel would still "work" but with
    // silently coarsened ordering. Accept integral epoch columns as-is and
    // convert timestamp forms to epoch-ns explicitly; reject anything else.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, TimestampType, TimestampNTZType}
    val tsExpr = events.schema(tsCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => col(tsCol).cast("long")
      case TimestampType | TimestampNTZType =>
        expr(s"unix_micros(cast($tsCol as timestamp)) * 1000")
      case other => throw new IllegalArgumentException(
        s"funnel: $tsCol must be an integral epoch or TIMESTAMP[_NTZ] column, got $other")
    }
    val packed = events
      .select(col(keyCol).as("key"), tsExpr.as("ts"),
        col(typeCol).as("et"))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("ts"), col("et")))).as("evs"))
    val init = s"array(${stages.map(_ => "cast(null as bigint)").mkString(", ")})"
    val whens = stages.zipWithIndex.map { case (s, i) =>
      val ready = if (i == 0) s"acc[$i] is null"
        else s"acc[$i] is null and acc[${i - 1}] is not null and e.ts > acc[${i - 1}]"
      val next = stages.indices.map(j => if (j == i) "e.ts" else s"acc[$j]")
      s"when $ready and e.et = '$s' then array(${next.mkString(", ")})"
    }.mkString(" ")
    packed
      .withColumn("st", expr(s"aggregate(evs, $init, (acc, e) -> case $whens else acc end)"))
      .withColumn("stage", expr("size(filter(st, x -> x is not null))"))
      .select(col("key"), col("stage"), col("st"))
  }
}
