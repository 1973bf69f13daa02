package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key grid (every bucket between the key's first and last event)
  * and forward-fill measure columns across the gaps — the step between
  * "raw events" and anything that wants an equally-spaced series
  * (rate-of-change, moving averages, charting, feature windows).
  *
  * The reference has no time-series surface at all (processing-time
  * sessions only); this generalizes its per-key event fold to a dense
  * per-key timeline.
  *
  * Scale shape: one shuffle on the key for the per-bucket aggregate,
  * then the grid is generated WITH `sequence()` inside each key's rows
  * (no cross join against a calendar table, no driver-side date loop)
  * and the forward fill is a single per-key ordered window — the same
  * partitioning as the aggregate, so AQE reuses the exchange. Grid
  * size is bounded by (span / bucket) per key, independent of event
  * count.
  */
object Resample {

  /** Aggregate `df` per (key, bucket = tsCol div bucketNs), densify each
    * key's [min bucket, max bucket] range, and forward-fill `fillCol`
    * (the last non-null per-bucket value). Emits:
    * key, bucket, n_events (0 on gap rows), filled fill column, is_gap.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, bucketNs: Long,
      fillCol: String, fillAgg: Column => Column): DataFrame = {
    val daily = df
      .withColumn("bucket", expr(s"$tsCol div $bucketNs"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"), fillAgg(col(fillCol)).as("bucket_val"))
    // Each existing row emits the gap buckets FOLLOWING it (strictly
    // before the key's next observed bucket) plus itself: pure row-local
    // generation, so the densify step is exchange-free on top of the
    // aggregate's partitioning — the [first, last] grid falls out of the
    // lead() chain, no per-key min/max needed.
    val withNext = daily.withColumn("next_b",
      lead(col("bucket"), 1).over(Window.partitionBy(col(keyCol)).orderBy(col("bucket"))))
    val exploded = withNext
      .withColumn("gb", explode(expr("sequence(bucket, coalesce(next_b, bucket + 1) - 1)")))
      .select(col(keyCol), col("gb").as("bucket"),
        when(col("gb") === col("bucket"), col("n_events")).otherwise(lit(0L)).as("n_events"),
        when(col("gb") === col("bucket"), col("bucket_val")).as("bucket_val"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    exploded
      .withColumn("filled_val", last(col("bucket_val"), ignoreNulls = true).over(w))
      .withColumn("is_gap", when(col("n_events") === 0L, 1).otherwise(0))
      .drop("bucket_val")
  }
}
