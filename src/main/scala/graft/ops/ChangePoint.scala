package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key CUSUM change-point detection over a bucketed measure — the
  * data-ops monitor that localizes WHEN a metric shifted (an ingest
  * change, a source going dark), completing the monitoring stack next to
  * the MAD outlier scan (q60, which points), the OLS trend (q105, which
  * slopes) and the chi-square drift gate (q101, which compares slices).
  *
  * Statistic: for buckets 1..T with prefix sums S_t and total S_T, the
  * scaled CUSUM deviation D_t = |S_t·T − S_T·t| — the classic
  * mean-shift statistic with the division cleared so every candidate
  * split replays as exact integer arithmetic (a max-likelihood
  * step-change localizer up to the constant factor). The best split is
  * argmax over interior t, ties to the EARLIEST bucket (change points
  * should report the first moment the evidence peaks). Reported
  * deviation is D_max div T — the mean-level gap in the measure's e-4
  * fixed-point units — so the output stays BIGINT-safe at any T.
  *
  * Scale shape: one scan → one (key, bucket) hash-aggregate with
  * map-side partials → per-key window (the number of BUCKETS per key,
  * not events — bounded, e.g. days) → one final hash-aggregate through
  * the ArgMaxByOrd kernel (hash-based, not SortAggregate). Keys with a
  * single bucket keep a null-split census row — the q105 no-evidence
  * stance. */
object ChangePoint {

  def cusumSplit(df: DataFrame, keyCols: Seq[String], bucketCol: Column,
      yCol: Column): DataFrame = {
    import graft.functions.NativeExpressions.argMaxBy
    val keys = keyCols.map(col)
    val daily = df
      .groupBy(keys :+ bucketCol.cast("long").as("__b"): _*)
      .agg(sum((yCol.cast("decimal(18,4)") * 10000).cast("long")).as("__y"))
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = daily
      .withColumn("__idx", row_number().over(wOrd))
      .withColumn("__cum", sum(col("__y")).over(wOrd))
      .withColumn("__nb", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("__y")).over(wAll))
      // interior splits only; the boundary t=T always has D=0 anyway
      .withColumn("__dev", when(col("__idx") < col("__nb"), expr(
        "abs(cast(__cum as decimal(38,0)) * __nb - cast(__tot as decimal(38,0)) * __idx)")))
    scored
      .groupBy(keys: _*)
      .agg(
        max(col("__nb")).as("n_buckets"),
        // argmax deviation, ties to the EARLIEST bucket; the null __dev
        // of the t=T row (and of 1-bucket keys) is ignored by the kernel
        argMaxBy(col("__b"), col("__dev"), -col("__b")).as("split_bucket"),
        expr("cast(max(__dev) div max(__nb) as bigint)").as("dev_e4"))
      .select(keys :+ col("n_buckets") :+ col("split_bucket") :+ col("dev_e4"): _*)
  }
}
