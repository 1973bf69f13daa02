package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed ORDER STATISTICS without an unpartitioned row-table
  * window.
  *
  * The naive exact-rank formulation — `row_number().over(Window.orderBy(v))`
  * on the row table — funnels the entire input through ONE task (Spark
  * plans an empty-partition Window as a single-partition sort), which is
  * the canonical 100 TB scale-killer even when it measures flat at test
  * scale. The repo's q93/q71/q100 discipline replaces it with a rank over
  * the (value, count) HISTOGRAM; this object generalizes that discipline
  * with a bucketed two-level prefix sum so even the histogram pass never
  * runs an unbounded unpartitioned window:
  *
  *   1. histogram:   groupBy(value) → nv            (parallel hash agg)
  *   2. range-bucket each distinct value into ≤ `buckets` cells by a
  *      monotone (min,width) map                    (map-only)
  *   3. per-bucket totals → cumulative over ≤ `buckets` rows
  *                                                  (BOUNDED window)
  *   4. within-bucket cumulative, partitioned by bucket
  *                                                  (partitioned window)
  *   5. cum(value) = bucket offset + within-bucket cumulative
  *
  * Every window is either bounded (≤ `buckets` rows per group) or
  * partitioned; exactness is unconditional — bucketing only places
  * boundaries, never changes a count. The value at row-rank k of the
  * fully tie-broken ordering (value, id) is then `min value with
  * cum ≥ k` — the id tie-break cannot change the VALUE at any rank, so
  * order-statistic THRESHOLDS (medians, percentile bounds) come straight
  * off the histogram. Per-row tie-broken ranks (q141's terciles) need
  * row-level work only inside the ≤ parts−1 value groups that straddle a
  * bucket boundary — see [[rankBucket]].
  */
object OrderStats {

  /** Cumulative value histogram: one row per distinct (groupCols, value)
    * with `nv` (count) and `cum` (rows with value′ ≤ value within the
    * group). `valueCol` must be numeric (cast to long internally for the
    * bucket map only; emitted unchanged) and NON-NULL: ranking nulls is a
    * convention, not a fact (NULLS FIRST vs LAST diverge between engines,
    * and the rankBucket equi-join would silently drop them), so a null
    * value fails the job loudly — the events-loader fail-loud posture —
    * instead of mis-ranking. The guard costs one predicate on the
    * DISTINCT-value table, never a pass over rows. Input should be
    * pre-projected to (groupCols, valueCol) — the histogram carries no
    * payload. */
  def cumHistogram(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil, buckets: Int = 1024): DataFrame = {
    val g = groupCols.map(col)
    val hist = df.groupBy((g :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("nv"))
      // assert_true yields NULL on pass, so the `when` keeps nv intact;
      // a null value raises at the first histogram materialization
      .withColumn("nv", when(assert_true(col(valueCol).isNotNull,
          lit(s"OrderStats: null in '$valueCol' — null ranking is undefined; " +
            "filter or coalesce before ranking")).isNull, col("nv")))
    cumSums(hist, valueCol, Seq("nv"), groupCols, buckets)
      .withColumnRenamed("cum_nv", "cum")
  }

  /** Generalized scale-safe prefix sums: for a table with ONE ROW PER
    * DISTINCT (groupCols, value) — a histogram, a CDF step table, any
    * reduced value-keyed aggregate — compute `cum_<m>` = Σ m over rows
    * with value′ ≤ value (within the group) for every measure column,
    * WITHOUT an unbounded unpartitioned window. Same two-level bucket
    * scheme as the object doc: a ≤`buckets`-row bucket-offset window plus
    * a bucket-partitioned within-bucket window; exactness is
    * unconditional. Input rows that violate the one-row-per-value
    * precondition are reduced by summing measures per value (ties in an
    * ordered running sum are otherwise ill-defined). Returns
    * (groupCols…, valueCol, measures…, cum_<m>…), one row per distinct
    * value. */
  def cumSums(df: DataFrame, valueCol: String, measureCols: Seq[String],
      groupCols: Seq[String] = Nil, buckets: Int = 1024): DataFrame = {
    require(measureCols.nonEmpty, "cumSums needs at least one measure")
    val g = groupCols.map(col)
    val mAggs = measureCols.map(m => sum(col(m)).as(m))
    // eager: the reduced one-row-per-value table fans out to THREE
    // consumers (bounds, the bucket totals, the final join) —
    // unmaterialized, the whole upstream subtree (often a corpus-wide
    // aggregation) was inlined and re-executed per consumer. The
    // checkpoint is histogram-sized, never row-table-sized.
    val dedup = df.groupBy((g :+ col(valueCol)): _*)
      .agg(mAggs.head, mAggs.tail: _*)
      .localCheckpoint(true)
    // monotone range-bucket map: only ORDER of bucket ids vs values
    // matters (cum is exact regardless of how values land in buckets),
    // so the double arithmetic is safe — long→double is monotone
    val bounds = dedup.groupBy(g: _*)
      .agg(min(col(valueCol)).cast("double").as("__mn"),
        max(col(valueCol)).cast("double").as("__mx"))
    val withB =
      (if (groupCols.isEmpty) dedup.crossJoin(broadcast(bounds))
       else dedup.join(broadcast(bounds), groupCols))
        .withColumn("__bk", least(lit(buckets - 1),
          floor((col(valueCol).cast("double") - col("__mn")) * buckets /
            (col("__mx") - col("__mn") + 1d)).cast("int")))
    val bnAggs = measureCols.map(m => sum(col(m)).as(s"__bn_$m"))
    val bucketCum = measureCols.foldLeft(
      withB.groupBy((g :+ col("__bk")): _*).agg(bnAggs.head, bnAggs.tail: _*)
    ) { (acc, m) =>
      acc.withColumn(s"__boff_$m", sum(col(s"__bn_$m")).over(
        Window.partitionBy(g: _*).orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, 0)) - col(s"__bn_$m"))
    }
    val joined = withB.join(
      bucketCum.select((g :+ col("__bk")) ++
        measureCols.map(m => col(s"__boff_$m")): _*),
      groupCols :+ "__bk")
    measureCols.foldLeft(joined) { (acc, m) =>
      acc.withColumn(s"cum_$m", col(s"__boff_$m") + sum(col(m)).over(
        Window.partitionBy((g :+ col("__bk")): _*).orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, 0)))
    }.select((g :+ col(valueCol)) ++ measureCols.map(col) ++
      measureCols.map(m => col(s"cum_$m")): _*)
  }

  /** Equal-frequency bucket per row — `(rank−1)·parts div n + 1` where
    * rank = row_number over the total order (valueCol, idCol) — computed
    * scale-safely. Returns (idCol, outCol): join it back on idCol.
    *
    * Values whose tie group lies inside one bucket (all but ≤ parts−1
    * groups) are assigned from the histogram alone; the straddling
    * groups get their id-tie-broken within-group ranks from a window
    * PARTITIONED by value over only those groups' rows. Residual skew:
    * a single tied value spanning a boundary ranks its ties in one
    * task — unavoidable for exact tie-broken semantics, bounded by the
    * tie-group size, and never the whole table. */
  def rankBucket(df: DataFrame, valueCol: String, idCol: String,
      parts: Int, outCol: String): DataFrame = {
    // eager: (value, id) feeds the histogram AND the settled/straddle
    // joins — three consumers of what is often an expensive upstream
    val base = df.select(col(valueCol), col(idCol)).localCheckpoint(true)
    val hist = cumHistogram(base.select(valueCol), valueCol)
    val tot = hist.agg(sum(col("nv")).as("__n")) // 1 row
    val h = hist.crossJoin(broadcast(tot))
      // bucket of the group's first and last rank
      .withColumn("__blo", expr(s"(cum - nv) * $parts div __n + 1"))
      .withColumn("__bhi", expr(s"(cum - 1) * $parts div __n + 1"))
      // eager: consumed by both the settled and the straddle side;
      // always histogram-sized
      .localCheckpoint(true)
    val settled = base
      .join(h.filter(col("__blo") === col("__bhi"))
          .select(col(valueCol), col("__blo").as(outCol)),
        Seq(valueCol))
      .select(col(idCol), col(outCol))
    val straddle = h.filter(col("__blo") =!= col("__bhi"))
      .select(col(valueCol), (col("cum") - col("nv")).as("__cp"), col("__n"))
    val split = base.join(broadcast(straddle), Seq(valueCol)) // ≤ parts−1 keys
      .withColumn("__wr", row_number().over(
        Window.partitionBy(col(valueCol)).orderBy(col(idCol))))
      .withColumn(outCol, expr(s"(__cp + __wr - 1) * $parts div __n + 1"))
      .select(col(idCol), col(outCol))
    settled.unionByName(split)
  }

  /** [[rankBucket]] for SEVERAL metrics of one table in ONE histogram
    * pipeline: `metrics` maps metricCol → outCol; returns (idCol,
    * out₁, out₂, …). The input unpivots to (metric, value, id) rows and
    * every stage of the bucketed-histogram rank runs once, grouped by
    * metric — one shuffle set for all metrics instead of one full
    * pipeline per metric (q141 ran three). Values are cast to LONG for
    * the shared unpivot column: exact for the integer/fixed-point
    * metrics this repo ranks (the e-4 convention); don't feed raw
    * doubles. Semantics per metric are exactly [[rankBucket]]'s:
    * equal-frequency bucket of the (value, id) total order, straddling
    * tie groups ranked in a window partitioned by (metric, value). */
  def rankBuckets(df: DataFrame, metrics: Seq[(String, String)],
      idCol: String, parts: Int): DataFrame = {
    // eager: the unpivoted (id, metric, value) rows feed the histogram
    // AND the settled/straddle joins, and df itself is usually an
    // aggregation (q141: the full RFM rollup) — three inlined copies
    // otherwise
    val long = df.select(col(idCol),
      explode(map(metrics.flatMap { case (m, _) =>
        Seq(lit(m), col(m).cast("long")) }: _*)).as(Seq("__metric", "__v")))
      .localCheckpoint(true)
    val hist = cumHistogram(long.select(col("__metric"), col("__v")),
      "__v", groupCols = Seq("__metric"))
    val tot = hist.groupBy(col("__metric")).agg(sum(col("nv")).as("__n"))
    val h = hist.join(broadcast(tot), Seq("__metric"))
      .withColumn("__blo", expr(s"(cum - nv) * $parts div __n + 1"))
      .withColumn("__bhi", expr(s"(cum - 1) * $parts div __n + 1"))
      .localCheckpoint(true) // two consumers, histogram-sized
    val settled = long
      .join(h.filter(col("__blo") === col("__bhi"))
          .select(col("__metric"), col("__v"), col("__blo").as("__bk")),
        Seq("__metric", "__v"))
      .select(col(idCol), col("__metric"), col("__bk"))
    val straddle = h.filter(col("__blo") =!= col("__bhi"))
      .select(col("__metric"), col("__v"),
        (col("cum") - col("nv")).as("__cp"), col("__n"))
    val split = long.join(broadcast(straddle), Seq("__metric", "__v"))
      .withColumn("__wr", row_number().over(
        Window.partitionBy(col("__metric"), col("__v")).orderBy(col(idCol))))
      .withColumn("__bk", expr(s"(__cp + __wr - 1) * $parts div __n + 1"))
      .select(col(idCol), col("__metric"), col("__bk"))
    settled.unionByName(split)
      .groupBy(col(idCol))
      .pivot("__metric", metrics.map(_._1))
      .agg(first(col("__bk")))
      .select(col(idCol) +: metrics.map { case (m, o) => col(m).as(o) }: _*)
  }
}
