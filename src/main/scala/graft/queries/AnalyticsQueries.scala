package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{Merge, Resample}

/** Warehouse-maintenance + product-analytics surface (round 3): CDC
  * merge, time-series gap-fill, cohort retention. These are the verbs a
  * user of the reference's consolidated KTable reaches for next — the
  * incremental snapshot the fold maintains (Merge), and the dense
  * timeline / cohort views the event stream feeds (Resample, retention).
  */
object AnalyticsQueries {

  private val DayNs = 86400L * 1000000000L
  /** epoch day of 2024-01-01, the corpus' first event day */
  private val Day0 = 19723L

  /** Q54 — CDC merge (MERGE INTO semantics): apply a change set derived
    * from `orders` to the `customer` snapshot — per-customer balance
    * deltas as upserts, every 53rd key a delete, and a synthetic
    * new-customer insert per 29th key (keys offset by 10M so they miss
    * the base). One full-outer hash join; decimal-exact balance math
    * (ops.Merge). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("int"),
        col("c_acctbal"))
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("delta"),
        count(lit(1)).as("n_orders"))
    val upd = perCust.select(
      col("o_custkey").as("c_custkey"),
      when(col("o_custkey") % 53 === 0, "D").otherwise("U").as("op"),
      col("delta"), col("n_orders"))
    val ins = perCust.filter(col("o_custkey") % 29 === 0).select(
      (col("o_custkey") + 10000000L).as("c_custkey"),
      lit("U").as("op"), col("delta"), col("n_orders"))
    Merge.applyChangeSet(base, upd.unionAll(ins), "c_custkey", "op", Seq(
      "c_name" -> coalesce(col("c_name"), lit("NEW")),
      "c_nationkey" -> coalesce(col("c_nationkey"), lit(-1)),
      "acctbal" -> when(col("op").isNull, col("c_acctbal"))
        .otherwise(round((coalesce(col("c_acctbal").cast("decimal(18,4)"), lit(0))
          + col("delta")).cast("double"), 4)),
      "n_orders" -> coalesce(col("n_orders"), lit(0L))))
      .orderBy(col("c_custkey"))
  }

  val mergeUpsertSql: String =
    """WITH chg AS (
      |  SELECT o_custkey AS c_custkey,
      |    CASE WHEN o_custkey % 53 = 0 THEN 'D' ELSE 'U' END AS op,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS delta,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1, 2
      |  UNION ALL
      |  SELECT o_custkey + 10000000 AS c_custkey, 'U' AS op,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS delta,
      |    COUNT(*) AS n_orders
      |  FROM orders WHERE o_custkey % 29 = 0 GROUP BY 1, 2)
      |SELECT
      |  coalesce(c.c_custkey, g.c_custkey) AS c_custkey,
      |  coalesce(c.c_name, 'NEW') AS c_name,
      |  CAST(coalesce(c.c_nationkey, -1) AS INTEGER) AS c_nationkey,
      |  CASE WHEN g.op IS NULL THEN c.c_acctbal
      |       ELSE round(CAST(coalesce(CAST(c.c_acctbal AS DECIMAL(18,4)), 0) + g.delta AS DOUBLE), 4)
      |  END AS acctbal,
      |  CAST(coalesce(g.n_orders, 0) AS BIGINT) AS n_orders,
      |  CASE WHEN g.op IS NULL THEN 'kept'
      |       WHEN c.c_custkey IS NOT NULL THEN 'updated'
      |       ELSE 'inserted' END AS merge_action
      |FROM customer c FULL OUTER JOIN chg g USING (c_custkey)
      |WHERE g.op IS NULL OR g.op = 'U'
      |ORDER BY c_custkey""".stripMargin

  /** Q55 — time-series gap-fill: daily per-user event counts + sums,
    * densified onto the user's [first, last] day grid with the daily sum
    * forward-filled across gap days (ops.Resample — sequence-explode
    * densify, no calendar cross-join; one shuffle, windows reuse it). */
  def gapFill(spark: SparkSession, dir: String): DataFrame =
    Resample.gapFill(
      Tables.events(spark, dir), "user_id", "ts", DayNs,
      "value", c => dsum(c))
      .select(col("user_id"), col("bucket").as("day"), col("n_events"),
        col("filled_val").as("filled_sum"), col("is_gap"))
      .orderBy(col("user_id"), col("day"))

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |    COUNT(*) AS n,
      |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS day_sum
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
      |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span),
      |j AS (
      |  SELECT g.user_id, g.day, d.n, d.day_sum
      |  FROM grid g LEFT JOIN daily d USING (user_id, day))
      |SELECT user_id, day,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
      |  last_value(day_sum IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
      |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
      |FROM j ORDER BY user_id, day""".stripMargin

  /** Q56 — cohort retention: users grouped by first-active week, the
    * classic (cohort, week) activity triangle with retention in exact
    * integer basis points. Three aggregations, all on the user key —
    * one partitioning end-to-end. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    // ts >= Day0 is ENFORCED, not assumed: below the epoch the week index
    // goes negative, where Spark's `div` (truncate toward zero) and the
    // oracle's `//` (floor) disagree — the filter (mirrored in the SQL)
    // makes the divergence impossible instead of merely absent in this
    // corpus.
    val active = Tables.events(spark, dir)
      .filter(col("ts") >= lit(Day0 * DayNs))
      .select(col("user_id"),
        expr(s"(ts div $DayNs - $Day0) div 7").as("week"))
      .distinct()
    val cohorts = active.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"), col("week"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week"), col("n_active"), col("n_cohort"),
        expr("(n_active * 10000) div n_cohort").as("retention_bp"))
      .orderBy(col("cohort_week"), col("week"))
  }

  val retentionSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id,
      |    (epoch_ns(ts) // 86400000000000 - 19723) // 7 AS week
      |  FROM events WHERE epoch_ns(ts) >= 19723 * 86400000000000),
      |coh AS (SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id),
      |sizes AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM coh GROUP BY cohort_week),
      |ret AS (
      |  SELECT c.cohort_week, a.week, COUNT(*) AS n_active
      |  FROM active a JOIN coh c USING (user_id) GROUP BY 1, 2)
      |SELECT r.cohort_week, r.week,
      |  CAST(r.n_active AS BIGINT) AS n_active,
      |  CAST(s.n_cohort AS BIGINT) AS n_cohort,
      |  CAST((r.n_active * 10000) // s.n_cohort AS BIGINT) AS retention_bp
      |FROM ret r JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, week""".stripMargin

  /** Q60 — robust outlier detection: per event type, values more than
    * 3 median-absolute-deviations from the median. Medians (exact
    * interpolated percentiles, the q28-proven parity path) instead of
    * mean/stddev so a few extreme values can't mask themselves by
    * inflating the threshold. Two aggregation passes; the per-type
    * statistics re-join by broadcast (the type dimension is tiny at any
    * corpus scale). */
  def outliersMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val stats = dev.groupBy(col("event_type"))
      .agg(min(col("med")).as("med"),
        expr("percentile(adev, 0.5D)").as("mad"),
        count(lit(1)).as("n"))
    dev.join(broadcast(stats.select(col("event_type"), col("mad"))), Seq("event_type"))
      .filter(col("adev") > col("mad") * 3)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_outliers"))
      .join(stats, Seq("event_type"), "right_outer")
      .select(col("event_type"), col("n"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
        col("med"), col("mad"))
      .orderBy(col("event_type"))
  }

  val outliersMadSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med, COUNT(*) AS n
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)),
      |stats AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY event_type),
      |outl AS (
      |  SELECT d.event_type, COUNT(*) AS n_outliers
      |  FROM dev d JOIN stats s USING (event_type)
      |  WHERE d.adev > s.mad * 3 GROUP BY d.event_type)
      |SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
      |  CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers,
      |  m.med, s.mad
      |FROM med m JOIN stats s USING (event_type)
      |LEFT JOIN outl o USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** Q64 — semi-structured data: parse the JSON `props` payload into a
    * typed column (`from_json` with an explicit schema — schema-on-read,
    * pushdown-friendly, no per-row UDF) and aggregate it. The reference
    * carries all enrichment as JSON-serialized maps on the wire; this is
    * the query-side half of that contract. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
      |  CAST(COUNT(DISTINCT CAST(props->>'k' AS INTEGER)) AS BIGINT) AS n_distinct_k,
      |  MIN(CAST(props->>'k' AS INTEGER)) AS min_k,
      |  MAX(CAST(props->>'k' AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q66 — RANGE-frame rolling window: each event with its user's
    * trailing-7-day event count and decimal-exact value sum. The frame
    * is value-based (RANGE on the epoch-ns ordering column), the frame
    * shape q24's ROWS windows don't cover; tied timestamps are peers and
    * enter the frame together in both engines. One shuffle on the user
    * key, then a single ordered pass per partition. */
  def rollingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekNs = 7L * DayNs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-weekNs, 0)
    Tables.events(spark, dir)
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("sum_7d",
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double"), 4))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_7d"), col("sum_7d"))
      .orderBy(col("event_id"))
  }

  val rollingWindowSql: String =
    """SELECT event_id, user_id, epoch_ns(ts) AS ts,
      |  COUNT(*) OVER w AS n_7d,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |             RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Q105 — per-user linear trend (Trend.linearTrend): the exact OLS
    * slope of `value` over event time, micro-units per second, every
    * moment an integer and the division truncation-exact in both
    * engines (Spark's regr_slope is FP and order-dependent — unusable
    * against an oracle). Users whose events share one second report a
    * null slope but keep their census row. */
  def trend(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Trend.linearTrend(
      Tables.events(spark, dir), Seq("user_id"), col("ts"), col("value"))
      .orderBy(col("user_id"))

  val trendSql: String =
    """WITH base AS (SELECT MIN(epoch_ns(ts)) AS x0 FROM events),
      |pts AS (
      |  SELECT user_id,
      |    (epoch_ns(ts) - x0) // 1000000000 AS x,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
      |  FROM events, base),
      |m AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM pts GROUP BY 1)
      |SELECT user_id, n_events,
      |  CAST(CASE WHEN n_events::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN NULL
      |    ELSE (n_events::HUGEINT * sxy - sx::HUGEINT * sy) * 100
      |         // (n_events::HUGEINT * sxx - sx::HUGEINT * sx)
      |  END AS BIGINT) AS slope_e6
      |FROM m ORDER BY user_id""".stripMargin

  /** Q113 — CUSUM change-point localization (ChangePoint.cusumSplit):
    * per event_type, the day where the daily value total most likely
    * step-changed — argmax over interior days of the division-cleared
    * CUSUM deviation |S_t·T − S_T·t|, ties to the earliest day, exact
    * integer arithmetic end-to-end. The monitoring verb that answers
    * "WHEN did this metric shift", next to q60 (which events are
    * outliers), q105 (what's the trend) and q101 (how far apart are two
    * slices). The oracle replays the daily fixed-point totals, every
    * prefix sum, every candidate deviation, and the tie-broken argmax. */
  def changePoint(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ChangePoint.cusumSplit(
      Tables.events(spark, dir), Seq("event_type"),
      expr(s"ts div $DayNs"), col("value"))
      .orderBy(col("event_type"))

  val changePointSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS b,
      |    SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS y
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, b, y,
      |    row_number() OVER w AS t,
      |    SUM(y) OVER w AS st,
      |    COUNT(*) OVER p AS tt,
      |    SUM(y) OVER p AS stt
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY b
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         p AS (PARTITION BY event_type)),
      |d AS (
      |  SELECT event_type, b, tt,
      |    CASE WHEN t < tt THEN abs(st::HUGEINT * tt - stt::HUGEINT * t) END AS dev
      |  FROM c),
      |best AS (
      |  SELECT event_type, tt, b, dev,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY dev DESC NULLS LAST, b ASC) AS rn,
      |    MAX(dev) OVER (PARTITION BY event_type) AS dmax
      |  FROM d)
      |SELECT event_type, CAST(tt AS BIGINT) AS n_buckets,
      |  CAST(CASE WHEN dmax IS NOT NULL THEN b END AS BIGINT) AS split_bucket,
      |  CAST(dmax // tt AS BIGINT) AS dev_e4
      |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** Q118 — behavioral PATH mining: the top event-type trigram sequences
    * users actually walk (ordered by (ts, event_id) within user), with
    * occurrence and distinct-user counts — the sequence-FREQUENCY verb
    * next to the sequence-MATCHING funnel (q53/q90 ask "who completed
    * this given path"; this asks "which paths exist"). One window over
    * each user's stream (two leads), one hash-aggregate on the path
    * string, top-20 with ties to the path. Scale: the window partitions
    * by user (bounded per-user streams), the aggregate's key space is
    * |event_types|³ — tiny — so map-side partials collapse everything. */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(20)
  }

  val eventPathsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
      |SELECT e1 || '>' || e2 || '>' || e3 AS path,
      |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n_occurrences DESC, path ASC LIMIT 20""".stripMargin

  /** Q142 — BURST detection (rate-limit / abuse signal): each user's
    * maximum event count inside any trailing 60-second window —
    * computed exactly with a RANGE frame over the ns timeline (every
    * event evaluates the window ending at itself; the true sliding-max
    * equals the max over these, since any window's count is ≤ the count
    * at its last contained event). Top-20 burstiest users, ties to the
    * smaller id; the per-user window is the user's own stream. */
  def burstDetection(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-60L * 1000000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .withColumn("in_window", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("in_window")).as("max_burst"), count(lit(1)).as("n_events"))
      .orderBy(col("max_burst").desc, col("user_id").asc)
      .limit(20)
  }

  val burstDetectionSql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts FROM events),
      |c AS (
      |  SELECT user_id,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
      |      RANGE BETWEEN 60000000000 PRECEDING AND CURRENT ROW) AS in_window
      |  FROM ev)
      |SELECT user_id, CAST(MAX(in_window) AS BIGINT) AS max_burst,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM c GROUP BY 1
      |ORDER BY max_burst DESC, user_id ASC LIMIT 20""".stripMargin

  /** Q141 — RFM segmentation (recency / frequency / monetary): every
    * user scored into exact terciles per dimension — tercile =
    * (rank−1)·3 div n + 1 on the (metric, user_id) total order, so the
    * buckets are balanced and deterministic without quantile
    * interpolation — then rolled into the 27-cell segment census
    * (segment = r·100 + f·10 + m, 333 = best everywhere). The windows
    * rank the USER table (events already collapsed), and the census is
    * 27 keys — the q61 decile discipline applied to the classic
    * marketing segmentation. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("recency_ns"),
        count(lit(1)).as("frequency"),
        sum((col("value").cast("decimal(18,4)") * 10000).cast("long")).as("monetary_e4"))
      // three independent tercile passes + the final join read it
      .localCheckpoint(true)
    // exact (metric, user_id)-ranked terciles via the OrderStats
    // histogram — the old formulation ranked the whole user table
    // through THREE unpartitioned row windows; rankBuckets assigns all
    // but the ≤ 2 boundary-straddling tie groups per metric from the
    // (value, count) histogram, with ALL THREE metrics riding ONE
    // unpivoted histogram pipeline (one shuffle set, not three)
    val terciles = OrderStats.rankBuckets(
      users.select("user_id", "recency_ns", "frequency", "monetary_e4"),
      Seq("recency_ns" -> "r_t", "frequency" -> "f_t", "monetary_e4" -> "m_t"),
      "user_id", 3)
    users
      .join(terciles, Seq("user_id"))
      .withColumn("segment", expr("r_t * 100 + f_t * 10 + m_t"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary_e4")).as("monetary_e4"))
      .orderBy(col("segment"))
  }

  val rfmSegmentsSql: String =
    """WITH u AS (
      |  SELECT user_id, MAX(epoch_ns(ts)) AS recency_ns, COUNT(*) AS frequency,
      |    SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS monetary_e4
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT user_id, monetary_e4,
      |    row_number() OVER (ORDER BY recency_ns, user_id) AS rr,
      |    row_number() OVER (ORDER BY frequency, user_id) AS rf,
      |    row_number() OVER (ORDER BY monetary_e4, user_id) AS rm,
      |    COUNT(*) OVER () AS n
      |  FROM u),
      |seg AS (
      |  SELECT user_id, monetary_e4,
      |    ((rr - 1) * 3 // n + 1) * 100
      |      + ((rf - 1) * 3 // n + 1) * 10
      |      + ((rm - 1) * 3 // n + 1) AS segment
      |  FROM rk)
      |SELECT CAST(segment AS BIGINT) AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(monetary_e4) AS BIGINT) AS monetary_e4
      |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q139 — time-weighted average (TWAP) per event_type: each value
    * weighted by how long it was the LATEST observation —
    * Σ y_i·(t_{i+1}−t_i) div (t_last−t_first), the metric that an
    * arithmetic mean gets wrong whenever sampling is irregular (a value
    * held for an hour should count 3600× one held for a second).
    * Exact integers: e-4 fixed-point values × ns gaps in DECIMAL(38),
    * one truncating division; the (ts, event_id) total order pins the
    * gap assignment; zero-span keys keep a null census row. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("y"))
      .withColumn("gap", lead(col("ts"), 1).over(w) - col("ts"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("span_ns"),
        expr("sum(cast(y as decimal(38,0)) * gap)").as("__wsum"))
      .withColumn("twap_e4", expr(
        "cast(case when span_ns > 0 then __wsum div span_ns end as bigint)"))
      .select(col("event_type"), col("n_events"), col("span_ns"), col("twap_e4"))
      .orderBy(col("event_type"))
  }

  val twapSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
      |  FROM events),
      |g AS (
      |  SELECT event_type, ts, y,
      |    lead(ts, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) - ts AS gap
      |  FROM ev)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(ts) - MIN(ts) AS BIGINT) AS span_ns,
      |  CAST(CASE WHEN MAX(ts) - MIN(ts) > 0
      |       THEN SUM(y::HUGEINT * gap) // (MAX(ts) - MIN(ts)) END AS BIGINT) AS twap_e4
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q132 — two-sample Kolmogorov–Smirnov DISTANCE between corpus
    * slices (the continuous-variable companion of q101's token
    * chi-square: does the LENGTH distribution of one slice match the
    * rest?): D = max over thresholds of |F_A − F_B|, computed with the
    * division cleared — max |c_A·n_B − c_B·n_A| over the merged distinct
    * values, then ONE fixed-point division — so the statistic and its
    * argmax threshold (ties to the smallest value) replay exactly. The
    * CDF running sums ride OrderStats.cumSums over the DISTINCT-value
    * step table (doc lengths, not docs — but still unbounded enough that
    * the bucketed kernel, not a single-task window, carries them); the
    * final argmax is the hash-aggregable kernel. */
  def ksDistance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NativeExpressions.argMaxBy
    val flagged = Tables.documents(spark, dir)
      .select(col("n_chars").as("x"),
        when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("in_a"))
    val steps = flagged.groupBy(col("x"))
      .agg(sum(col("in_a")).as("da"), sum(lit(1L) - col("in_a")).as("db"))
    // the CDF running sums ride the OrderStats bucketed kernel (no
    // unpartitioned window over the distinct-value table), eagerly
    // materialized so the totals (= the last cumulative value, since the
    // CDF is monotone) don't replay the scan
    val cdf = graft.ops.OrderStats.cumSums(steps, "x", Seq("da", "db"))
      .withColumnRenamed("cum_da", "ca").withColumnRenamed("cum_db", "cb")
      .localCheckpoint(true)
    val tot = cdf.agg(max(col("ca")).as("na"), max(col("cb")).as("nb"))
    cdf
      .crossJoin(broadcast(tot))
      .withColumn("dnum", expr(
        "abs(cast(ca as decimal(38,0)) * nb - cast(cb as decimal(38,0)) * na)"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        argMaxBy(col("x"), col("dnum"), -col("x")).as("ks_at"),
        expr("cast(max(dnum) * 1000000 div (max(na) * cast(max(nb) as decimal(38,0))) as bigint)")
          .as("d_e6"))
  }

  val ksDistanceSql: String =
    """WITH f AS (
      |  SELECT n_chars AS x,
      |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS in_a
      |  FROM documents),
      |s AS (
      |  SELECT x, SUM(in_a) AS da, SUM(1 - in_a) AS db
      |  FROM f GROUP BY 1),
      |t AS (SELECT SUM(da) AS na, SUM(db) AS nb FROM s),
      |c AS (
      |  SELECT x,
      |    SUM(da) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |    SUM(db) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      |  FROM s),
      |d AS (
      |  SELECT c.x, abs(c.ca::HUGEINT * t.nb - c.cb::HUGEINT * t.na) AS dnum,
      |    t.na, t.nb
      |  FROM c, t),
      |best AS (
      |  SELECT x, dnum, na, nb,
      |    row_number() OVER (ORDER BY dnum DESC, x ASC) AS rn
      |  FROM d)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(x AS BIGINT) AS ks_at,
      |  CAST(dnum * 1000000 // (na::HUGEINT * nb) AS BIGINT) AS d_e6
      |FROM best WHERE rn = 1""".stripMargin

  /** Q133 — Benford first-digit audit of the value column (the
    * data-forensics gate: fabricated or unit-mangled amounts drift from the
    * log-uniform leading-digit law): first significant digit of the
    * cent-fixed-point value (leading char of the integer — no float
    * log10 anywhere), observed counts vs the Benford permille table
    * (301/176/125/…, exact literals on both sides), per-digit chi-square
    * contribution in 1e-6 units via DECIMAL(38). */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val BenfordPermille = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
    val expTable = BenfordPermille.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, $p)" }
    val ev = Tables.events(spark, dir)
      .withColumn("v_e2", (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .filter(col("v_e2") >= 1)
      .withColumn("digit", substring(col("v_e2").cast("string"), 1, 1).cast("int"))
    val obs = ev.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("n"))
    val expected = spark.sql(
      s"SELECT * FROM VALUES ${expTable.mkString(", ")} AS t(digit, exp_permille)")
    expected.join(obs, Seq("digit"), "left_outer")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("expected_milli", expr("exp_permille * n"))
      .withColumn("chi2_e6", expr(
        """cast((cast(n_obs as decimal(38,0)) * 1000 - cast(exp_permille as decimal(38,0)) * n)
          |  * (cast(n_obs as decimal(38,0)) * 1000 - cast(exp_permille as decimal(38,0)) * n)
          |  * 1000000 div (cast(exp_permille as decimal(38,0)) * n * 1000) as bigint)""".stripMargin))
      .select(col("digit"), col("n_obs"), col("expected_milli"), col("chi2_e6"))
      .orderBy(col("digit"))
  }

  val benfordSql: String =
    """WITH ev AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_e2
      |  FROM events),
      |d AS (
      |  SELECT CAST(substring(CAST(v_e2 AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM ev WHERE v_e2 >= 1),
      |obs AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
      |tot AS (SELECT SUM(n_obs) AS n FROM obs),
      |expd AS (
      |  SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
      |    (6, 67), (7, 58), (8, 51), (9, 46)) t(digit, exp_permille)),
      |j AS (
      |  SELECT e.digit, COALESCE(o.n_obs, 0) AS n_obs, e.exp_permille, t.n
      |  FROM expd e LEFT JOIN obs o USING (digit), tot t)
      |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
      |  CAST(exp_permille * n AS BIGINT) AS expected_milli,
      |  CAST((n_obs::HUGEINT * 1000 - exp_permille::HUGEINT * n)
      |       * (n_obs::HUGEINT * 1000 - exp_permille::HUGEINT * n)
      |       * 1000000 // (exp_permille::HUGEINT * n * 1000) AS BIGINT) AS chi2_e6
      |FROM j ORDER BY digit""".stripMargin

  /** Q129 — seasonality-aware anomaly pick: each event_type's daily
    * totals are compared against their DAY-OF-WEEK median baseline (the
    * seasonal decomposition a raw q60-style global scan would false-
    * positive on every weekend); the output is each type's single most
    * anomalous day — the largest |daily − dow-median| residual, ties to
    * the earliest day. Medians are exact lower order statistics; the
    * final argmax is one hash-aggregated ArgMaxByOrd over the (type,
    * day) table (days, not events). dow = (epoch_day + 4) mod 7 — the
    * 1970-01-01-was-Thursday convention, identical in both engines. */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.NativeExpressions.argMaxBy
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts div $DayNs").as("day"))
      .agg(sum((col("value").cast("decimal(18,4)") * 10000).cast("long")).as("y"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val ranked = daily
      .withColumn("r", row_number().over(
        Window.partitionBy(col("event_type"), col("dow")).orderBy(col("y"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("dow"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val med = ranked.groupBy(col("event_type"), col("dow"))
      .agg(min(when(col("r") === expr("(n + 1) div 2"), col("y"))).as("med"))
    daily.join(med, Seq("event_type", "dow"))
      .withColumn("resid", abs(col("y") - col("med")))
      .groupBy(col("event_type"))
      .agg(
        argMaxBy(col("day"), col("resid"), -col("day")).as("anom_day"),
        argMaxBy(col("dow"), col("resid"), -col("day")).as("anom_dow"),
        argMaxBy(col("y"), col("resid"), -col("day")).as("day_total_e4"),
        argMaxBy(col("med"), col("resid"), -col("day")).as("dow_median_e4"),
        max(col("resid")).as("residual_e4"))
      .orderBy(col("event_type"))
  }

  val seasonalitySql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS y
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT event_type, day, y, (day + 4) % 7 AS dow FROM daily),
      |rk AS (
      |  SELECT event_type, dow, y,
      |    row_number() OVER (PARTITION BY event_type, dow ORDER BY y) AS r,
      |    COUNT(*) OVER (PARTITION BY event_type, dow) AS n
      |  FROM d),
      |med AS (
      |  SELECT event_type, dow,
      |    MIN(CASE WHEN r = (n + 1) // 2 THEN y END) AS med
      |  FROM rk GROUP BY 1, 2),
      |res AS (
      |  SELECT d.event_type, d.day, d.dow, d.y, med.med,
      |    abs(d.y - med.med) AS resid,
      |    row_number() OVER (PARTITION BY d.event_type
      |      ORDER BY abs(d.y - med.med) DESC, d.day ASC) AS rn
      |  FROM d JOIN med USING (event_type, dow))
      |SELECT event_type, CAST(day AS BIGINT) AS anom_day,
      |  CAST(dow AS BIGINT) AS anom_dow,
      |  CAST(y AS BIGINT) AS day_total_e4,
      |  CAST(med AS BIGINT) AS dow_median_e4,
      |  CAST(resid AS BIGINT) AS residual_e4
      |FROM res WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** Q123 — telemetry DUPLICATE-EVENT census (ingest hygiene): an event
    * repeating the same (user, type) within 5 s of its predecessor is a
    * client-retry/double-fire artifact; the census reports per-type
    * volumes and the duplicate rate in exact permille — the gate a
    * pipeline checks before trusting event counts. One window over
    * (user, type) streams (lag on the (ts, event_id) total order), one
    * tiny-keyspace aggregate. */
  def eventDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("dup",
        when(col("prev").isNotNull && col("ts") - col("prev") <= 5000000000L, 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("dup")).as("n_dups"))
      .withColumn("dup_permille", expr("n_dups * 1000 div n_events"))
      .orderBy(col("event_type"))
  }

  val eventDedupSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type FROM events),
      |d AS (
      |  SELECT event_type,
      |    CASE WHEN lag(ts, 1) OVER w IS NOT NULL
      |              AND ts - lag(ts, 1) OVER w <= 5000000000 THEN 1 ELSE 0 END AS dup
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(dup) AS BIGINT) AS n_dups,
      |  CAST(SUM(dup) * 1000 // COUNT(*) AS BIGINT) AS dup_permille
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q124 — WINSORIZED robust statistics per event_type: clip values at
    * the exact p05/p95 ORDER STATISTICS (rank ceil(p·n) of the
    * fixed-point ordering — no interpolation, so unlike `percentile`
    * the bound is a value that exists and replays as an exact integer)
    * and report the raw vs winsorized mean in e-4 units. The
    * trim-the-tails companion to q60's MAD flagging: q60 finds the
    * outliers, this measures the metric with them neutralized. The
    * p05/p95 bounds come off the OrderStats value histogram (the value
    * at per-type row-rank k is the min distinct value with cum ≥ k —
    * row_number ties share the value, so the bound is identical), so no
    * window ever ranks the raw event rows: the only per-row ranking the
    * old 5-partition formulation did is replaced by partitioned
    * histogram windows + one tiny bounds table broadcast back. */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("y"))
    val hist = OrderStats.cumHistogram(base, "y", Seq("event_type"))
    val totals = hist.groupBy(col("event_type")).agg(sum(col("nv")).as("n"))
    val bounds = hist.join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(5 * n + 99) div 100"), col("y"))).as("lo_e4"),
        min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("y"))).as("hi_e4"))
    base.join(broadcast(bounds), Seq("event_type"))
      .withColumn("cy", greatest(col("lo_e4"), least(col("hi_e4"), col("y"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("lo_e4")).as("lo_e4"),
        max(col("hi_e4")).as("hi_e4"),
        expr("sum(y) div max(n)").as("mean_e4"),
        expr("sum(cy) div max(n)").as("winsor_mean_e4"))
      .orderBy(col("event_type"))
  }

  val winsorizedSql: String =
    """WITH base AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
      |  FROM events),
      |rk AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY y) AS r,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM base),
      |b AS (
      |  SELECT event_type, MAX(n) AS n,
      |    MIN(CASE WHEN r = (5 * n + 99) // 100 THEN y END) AS lo_e4,
      |    MIN(CASE WHEN r = (95 * n + 99) // 100 THEN y END) AS hi_e4
      |  FROM rk GROUP BY 1)
      |SELECT base.event_type, CAST(MAX(b.n) AS BIGINT) AS n,
      |  CAST(MAX(b.lo_e4) AS BIGINT) AS lo_e4,
      |  CAST(MAX(b.hi_e4) AS BIGINT) AS hi_e4,
      |  CAST(SUM(y) // MAX(b.n) AS BIGINT) AS mean_e4,
      |  CAST(SUM(greatest(b.lo_e4, least(b.hi_e4, y))) // MAX(b.n) AS BIGINT)
      |    AS winsor_mean_e4
      |FROM base JOIN b USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q122 — conversion ATTRIBUTION (first-touch × last-touch): every
    * purchase credited to the user's first and most recent non-purchase
    * touch within a 7-day lookback, rolled up into the attribution
    * matrix (n_purchases + distinct converting users per touch pair).
    * The RANGE frame ends at 1ns PRECEDING, so same-timestamp peers are
    * excluded by VALUE, and non-purchase events are pre-collapsed to ONE
    * deterministic touch row per (user_id, ts) — min(event_type) among
    * that instant's events — so first/last over ts-tied frame rows never
    * depends on partition-local row order (Spark) or unspecified peer
    * order (DuckDB). Purchases with no prior touch keep a 'none' census
    * cell. One tiny pre-aggregate + one window pass + one tiny-keyspace
    * aggregate. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_type")).as("touch"))
      .withColumn("is_purchase", lit(0))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("string").as("touch"), lit(1).as("is_purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-7L * DayNs, -1L)
    touches.unionByName(purchases)
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .groupBy(coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  val attributionSql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      |tch AS (
      |  SELECT user_id, ts, MIN(event_type) AS touch, 0 AS is_purchase
      |  FROM ev WHERE event_type <> 'purchase' GROUP BY 1, 2),
      |uni AS (
      |  SELECT * FROM tch
      |  UNION ALL
      |  SELECT user_id, ts, NULL AS touch, 1 AS is_purchase
      |  FROM ev WHERE event_type = 'purchase'),
      |tw AS (
      |  SELECT user_id, is_purchase,
      |    first_value(touch IGNORE NULLS) OVER w AS first_touch,
      |    last_value(touch IGNORE NULLS) OVER w AS last_touch
      |  FROM uni
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN 604800000000000 PRECEDING AND 1 PRECEDING))
      |SELECT COALESCE(first_touch, 'none') AS first_touch,
      |  COALESCE(last_touch, 'none') AS last_touch,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM tw WHERE is_purchase = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q149 — k-ANONYMITY / l-DIVERSITY census (Sweeney 2002; Machanavajjhala
    * 2007): release-risk governance for a training corpus carrying user
    * attributes. Quasi-identifier = (c_nationkey, c_mktsegment); sensitive
    * attribute = the account-balance sign bucket. For each candidate k the
    * census reports how many equivalence classes and rows fall BELOW the
    * k-anonymity bar (exact millionths) and the worst-case l-diversity
    * among the classes that pass. Scale shape: one exchange keyed on the
    * quasi-identifier builds the class table (bounded: |nations|×|segments|
    * rows); the per-k rollup is a broadcast cross over that tiny table —
    * the row table is scanned once, never re-shuffled per k. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit("debt")).otherwise(lit("credit")).as("sens"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sens")).as("l_div"))
      .localCheckpoint(true) // tiny (nations x segments); two consumers per k
    val ks = spark.range(0, 5).select(
      element_at(typedLit(Seq(2L, 5L, 10L, 25L, 50L)), (col("id") + 1).cast("int")).as("k"))
    ks.crossJoin(classes)
      .groupBy(col("k"))
      .agg(
        sum(when(col("class_size") < col("k"), lit(1L)).otherwise(lit(0L)))
          .as("n_classes_below"),
        sum(when(col("class_size") < col("k"), col("class_size")).otherwise(lit(0L)))
          .as("n_rows_below"),
        sum(col("class_size")).as("n_rows"),
        min(when(col("class_size") >= col("k"), col("l_div"))).as("min_l_safe"))
      .select(col("k"), col("n_classes_below"), col("n_rows_below"),
        expr("n_rows_below * 1000000 div n_rows").as("rows_below_micro"),
        coalesce(col("min_l_safe"), lit(0L)).as("min_l_safe"))
      .orderBy(col("k"))
  }

  val kAnonymitySql: String =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) AS class_size,
      |    CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END)
      |      AS BIGINT) AS l_div
      |  FROM customer GROUP BY 1, 2),
      |ks AS (SELECT unnest([2, 5, 10, 25, 50]) AS k)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(SUM(CASE WHEN class_size < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_below,
      |  CAST(SUM(CASE WHEN class_size < k THEN class_size ELSE 0 END) AS BIGINT)
      |    AS n_rows_below,
      |  CAST((SUM(CASE WHEN class_size < k THEN class_size ELSE 0 END) * 1000000)
      |    // SUM(class_size) AS BIGINT) AS rows_below_micro,
      |  CAST(COALESCE(MIN(CASE WHEN class_size >= k THEN l_div END), 0) AS BIGINT)
      |    AS min_l_safe
      |FROM ks, cls
      |GROUP BY k ORDER BY k""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q149_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("q113_changepoint", changePoint, Some(changePointSql)),
    QueryDef("q118_event_paths", eventPaths, Some(eventPathsSql)),
    QueryDef("q122_attribution", attribution, Some(attributionSql)),
    QueryDef("q123_event_dedup", eventDedup, Some(eventDedupSql)),
    QueryDef("q124_winsorized", winsorized, Some(winsorizedSql)),
    QueryDef("q129_seasonality", seasonality, Some(seasonalitySql)),
    QueryDef("q132_ks_distance", ksDistance, Some(ksDistanceSql)),
    QueryDef("q133_benford", benford, Some(benfordSql)),
    QueryDef("q139_twap", twap, Some(twapSql)),
    QueryDef("q141_rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
    QueryDef("q142_burst_detection", burstDetection, Some(burstDetectionSql)),
    QueryDef("q105_trend", trend, Some(trendSql)),
    QueryDef("q54_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QueryDef("q55_gap_fill", gapFill, Some(gapFillSql)),
    QueryDef("q56_retention", retention, Some(retentionSql)),
    QueryDef("q60_outliers_mad", outliersMad, Some(outliersMadSql)),
    QueryDef("q64_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q66_rolling_window", rollingWindow, Some(rollingWindowSql)))
}
