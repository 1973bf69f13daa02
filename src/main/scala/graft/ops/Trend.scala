package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key linear TREND (OLS slope) over a time-ordered measure — the
  * metric-monitoring verb on the consolidated event stream (is a user's
  * spend rising? is a source's quality drifting downward?), the
  * regression companion to the MAD outlier scan (q60) and the chi-square
  * drift monitor (q101).
  *
  * Spark ships `regr_slope` but it aggregates DOUBLES — order-dependent
  * across 1000 executors and useless against an exact oracle (the same
  * reason the repo's money sums go through `dsum`). Here every moment is
  * an exact integer: x = seconds since the corpus' first event (a 1-row
  * broadcast), y = the measure in fixed-point 1e-4 units (the decimal
  * cast both engines round identically), and
  *
  *   slope_e6 = (n·Σxy − Σx·Σy) · 100 div (n·Σx² − (Σx)²)
  *
  * in DECIMAL(38,0), truncated toward zero — both engines truncate
  * integer division toward zero (verified), so negative slopes replay
  * exactly too. Output slope is micro-y-units per second. Keys where the
  * denominator is 0 (a single distinct timestamp) report a null slope —
  * the no-evidence stance, kept as rows so the n_events census stays
  * complete.
  *
  * Scale shape: ONE scan, one (key) hash-aggregate with map-side partial
  * moments (all five sums are commutative longs), plus the 1-row
  * broadcast base. No window, no sort, no second pass. */
object Trend {

  def linearTrend(df: DataFrame, keyCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.agg(min(xCol).as("__x0"))
    df.crossJoin(broadcast(base)) // 1-row x origin
      .withColumn("__xd", (xCol - col("__x0")).cast("long"))
      // integer ns→s division — an FP divide would lose exactness past
      // 2^53 ns of range (~3 months); div stays exact at any horizon
      .withColumn("__x", expr("__xd div 1000000000"))
      .withColumn("__y", (yCol.cast("decimal(18,4)") * 10000).cast("long"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      // moments go DECIMAL(38,0) before combining: long arithmetic would
      // wrap silently on a wide x-range × heavy key
      .withColumn("__den", expr(
        "cast(n_events as decimal(38,0)) * __sxx - cast(__sx as decimal(38,0)) * __sx"))
      .withColumn("slope_e6", expr(
        """cast(case when __den = 0 then null else
          |  (cast(n_events as decimal(38,0)) * __sxy
          |   - cast(__sx as decimal(38,0)) * __sy) * 100 div __den
          |end as bigint)""".stripMargin))
      .select(keyCols.map(col) :+ col("n_events") :+ col("slope_e6"): _*)
  }
}
