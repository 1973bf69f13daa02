package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{Sessions, TimeJoins}

/** Event-stream surface over the `events` table (SURVEY.md §2E Q1/Q5/Q6).
  * `ts` is an epoch-nanosecond Long throughout (see Tables.events).
  */
object EventsQueries {

  private val GapNs = 500L * 1000000000L // 500 s, reference session gap

  /** Q1 — latest-state consolidation: fold the event log to latest-per-key
    * (the relational shape of the reference's KTable upsert fold,
    * reference: pipeline/impl/KafkaIntelligencePipeline.kt:364-382).
    *
    * Implemented with the native argmax aggregate over the (ts, event_id)
    * ordering — commutative, with map-side partial aggregation, i.e. the
    * 100 TB-friendly form (one small shuffle). The built-in
    * `max_by(x, struct(...))` would silently fall back to SortAggregate
    * (struct agg buffers don't fit HashAggregate's UnsafeRow), sorting
    * every partition of the events table before the partial agg —
    * NativeExpressions.ArgMaxByOrd keeps it hash-based. */
  def latestState(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NativeExpressions.argMaxBy
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        argMaxBy(col("event_type"), col("ts"), col("event_id")).as("last_type"),
        argMaxBy(col("value"), col("ts"), col("event_id")).as("last_value"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"))
  }

  val latestStateSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      |  FROM events),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_events, MAX(epoch_ns(ts)) AS last_ts,
      |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_value
      |  FROM events GROUP BY user_id)
      |SELECT a.user_id, a.n_events, a.last_ts, r.event_type AS last_type,
      |  r.value AS last_value, a.total_value
      |FROM agg a JOIN ranked r ON a.user_id = r.user_id AND r.rn = 1
      |ORDER BY a.user_id""".stripMargin

  /** Q5 — time-bounded self-join: same user, b strictly after a, within 60 s
    * (the reference joins records to chunks within ±1 s; our synthetic
    * events are sparser, so the window is 60 s to produce non-trivial
    * matches). Aggregated to pair counts per user. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_id"))
    TimeJoins.withinWindow(ev, ev, "user_id", "ts", 0L, 60L * 1000000000L)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val intervalJoinSql: String =
    """SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND epoch_ns(b.ts) > epoch_ns(a.ts)
      |  AND epoch_ns(b.ts) <= epoch_ns(a.ts) + 60000000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** Q6 — 500 s-gap sessionization + per-session aggregates
    * (reference: KafkaIntelligencePipelineTests.kt:325-333). */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Sessions.assignByGap(ev, col("user_id"), col("ts"), col("event_id"), GapNs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("start_ns"),
        max(col("ts")).as("end_ns"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // CAST(... AS BIGINT) on the running SUM: DuckDB's integer SUM returns
  // HUGEINT, which the driver's pandas comparator coerces to float64 while
  // Spark emits int64 — the cast keeps both sides int64.
  val sessionWindowsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, value, epoch_ns(ts) AS tns,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL THEN 1
      |         WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 500000000000 THEN 1
      |         ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) ASC, event_id ASC)),
      |sess AS (
      |  SELECT user_id, value, tns,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, MIN(tns) AS start_ns, MAX(tns) AS end_ns,
      |  COUNT(*) AS n_events,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** As-of join: each purchase annotated with the user's most recent
    * prior-or-equal click (graft.ops.AsOfJoin — union-and-carry, one
    * shuffle; the operator the reference lacks entirely). Oracle uses
    * DuckDB's native ASOF JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.ops.AsOfJoin.asOfExpanded(purchases, clicks, "user_id", "ts",
      Seq("event_id", "ts"), prefix = "click_")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("click_event_id").as("click_id"), col("click_ts"))
      .orderBy(col("purchase_id"))
  }

  val asofJoinSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  epoch_ns(p.ts) AS purchase_ts,
      |  c.event_id AS click_id,
      |  epoch_ns(c.ts) AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  /** Exact interpolated percentiles of event values per type — deterministic
    * iff both engines use the same linear-interpolation formula (they do:
    * index p*(n-1), convex combination of the two neighbours). Emitted as
    * scalar p25/p50/p95 columns: the driver's comparator cannot hash array
    * columns, and scalars are the friendlier shape anyway. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.95D))").as("pcts"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        element_at(col("pcts"), 1).as("p25"),
        element_at(col("pcts"), 2).as("p50"),
        element_at(col("pcts"), 3).as("p95"),
        col("n"))
      .orderBy(col("event_type"))

  val percentilesSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.25) AS p25,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.95) AS p95,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q50 — SCD2 temporal snapshot: the event log rewritten as validity
    * intervals (valid_from, valid_to) per user state change, the
    * slowly-changing-dimension form an analytics warehouse keeps instead
    * of (or next to) latest-state. One shuffle on the partition key; the
    * open interval uses a −1 sentinel (NULLs in a BIGINT column degrade
    * to float64 in pandas-based comparators) plus an explicit is_current
    * flag. An as-of join against this table is then a plain BETWEEN
    * lookup. */
  def scd2Snapshot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("valid_to", coalesce(lead(col("ts"), 1).over(w), lit(-1L)))
      .withColumn("is_current", when(col("valid_to") === -1L, 1).otherwise(0))
      .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        col("valid_to"), col("event_type"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  val scd2SnapshotSql: String =
    """SELECT user_id, event_id, epoch_ns(ts) AS valid_from,
      |  CAST(coalesce(LEAD(epoch_ns(ts)) OVER w, -1) AS BIGINT) AS valid_to,
      |  event_type,
      |  CAST(CASE WHEN LEAD(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Q53 — funnel analysis (view → click → purchase): users advance a
    * step only with a LATER event of the next type than their earliest
    * qualifying previous step (greedy matching — the standard funnel
    * semantics). Each stage is one user-keyed aggregation joined back to
    * the (already user-partitioned) event stream, so the three stages
    * reuse one partitioning; timestamps are exact epoch-ns integers, as
    * is the total view→purchase conversion time. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"), min(col("t1")).as("t1"))
    s1.agg(count(lit(1)).as("n_view"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase"),
        sum(col("t3") - col("t1")).as("total_convert_ns")))
  }

  val funnelSql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT ev.user_id, MIN(ev.ts) AS t2, MIN(s1.t1) AS t1
      |  FROM ev JOIN s1 USING (user_id)
      |  WHERE ev.event_type = 'click' AND ev.ts > s1.t1
      |  GROUP BY ev.user_id),
      |s3 AS (
      |  SELECT ev.user_id, MIN(ev.ts) AS t3, MIN(s2.t1) AS t1
      |  FROM ev JOIN s2 USING (user_id)
      |  WHERE ev.event_type = 'purchase' AND ev.ts > s2.t2
      |  GROUP BY ev.user_id)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
      |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
      |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
      |  (SELECT CAST(sum(t3 - t1) AS BIGINT) FROM s3) AS total_convert_ns""".stripMargin

  /** Q90 — generalized k-stage funnel (Sessions.funnel), the
    * MATCH_RECOGNIZE-shaped sequence operator: per user, the earliest
    * view → click → click → purchase chain (note the REPEATED stage — a
    * second click strictly after the first — which the per-stage
    * join-cascade form of q53 cannot express without another scan).
    * One scan and ONE exchange: time-ordered in-aggregate fold instead
    * of q53's three joined aggregations. The oracle replays the chain
    * as four nested min-aggregations, so greedy-fold = minimal-chain
    * equivalence is hash-gated per user. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Sessions.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "click", "purchase"))
      .select(col("key").as("user_id"), col("stage"),
        col("st")(0).as("view_ns"), col("st")(1).as("click1_ns"),
        col("st")(2).as("click2_ns"), col("st")(3).as("purchase_ns"))
      .orderBy(col("user_id"))
  }

  val funnelStagesSql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT ev.user_id, MIN(ev.ts) AS t2 FROM ev JOIN t1 USING (user_id)
      |       WHERE ev.event_type = 'click' AND ev.ts > t1.t1 GROUP BY 1),
      |t3 AS (SELECT ev.user_id, MIN(ev.ts) AS t3 FROM ev JOIN t2 USING (user_id)
      |       WHERE ev.event_type = 'click' AND ev.ts > t2.t2 GROUP BY 1),
      |t4 AS (SELECT ev.user_id, MIN(ev.ts) AS t4 FROM ev JOIN t3 USING (user_id)
      |       WHERE ev.event_type = 'purchase' AND ev.ts > t3.t3 GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT u.user_id,
      |  CAST(CASE WHEN t4.t4 IS NOT NULL THEN 4 WHEN t3.t3 IS NOT NULL THEN 3
      |            WHEN t2.t2 IS NOT NULL THEN 2 WHEN t1.t1 IS NOT NULL THEN 1
      |            ELSE 0 END AS INTEGER) AS stage,
      |  t1.t1 AS view_ns, t2.t2 AS click1_ns, t3.t3 AS click2_ns, t4.t4 AS purchase_ns
      |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |       LEFT JOIN t3 USING (user_id) LEFT JOIN t4 USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Q144 — engagement census over the q6 sessions: total sessions,
    * bounce rate (single-event sessions) in exact permille, and the
    * exact lower-median session size and duration (order statistics on
    * total orders — the q124 rank discipline). The medians come off the
    * OrderStats value histograms of the SESSION table (the value at
    * row-rank (n+1) div 2 of the tie-broken total order is the min
    * distinct value with cum ≥ that rank — the (user_id, session_id)
    * tie-break never changes the VALUE at a rank), so no window ranks
    * the session rows; output is one census row. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val sessions = Sessions.assignByGap(Tables.events(spark, dir),
      col("user_id"), col("ts"), col("event_id"), GapNs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("dur_ns"))
      // two histograms + the census aggregate read it
      .localCheckpoint(true)
    val census = sessions.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
    def median(valueCol: String, out: String) =
      OrderStats.cumHistogram(sessions.select(valueCol), valueCol)
        .crossJoin(broadcast(census.select(col("n_sessions").as("n"))))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col(valueCol))).as(out))
    census
      .crossJoin(median("n_events", "median_events"))
      .crossJoin(median("dur_ns", "median_duration_ns"))
      .withColumn("bounce_permille", expr("n_bounces * 1000 div n_sessions"))
      .select(col("n_sessions"), col("n_bounces"), col("bounce_permille"),
        col("median_events"), col("median_duration_ns"))
  }

  val sessionStatsSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
       |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL THEN 1
       |         WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > $GapNs THEN 1
       |         ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
       |assigned AS (
       |  SELECT user_id, tns,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
       |  FROM flagged),
       |sess AS (
       |  SELECT user_id, session_id, COUNT(*) AS n_events,
       |    MAX(tns) - MIN(tns) AS dur_ns
       |  FROM assigned GROUP BY 1, 2),
       |rk AS (
       |  SELECT n_events, dur_ns,
       |    row_number() OVER (ORDER BY n_events, user_id, session_id) AS re,
       |    row_number() OVER (ORDER BY dur_ns, user_id, session_id) AS rd,
       |    COUNT(*) OVER () AS n
       |  FROM sess)
       |SELECT CAST(MAX(n) AS BIGINT) AS n_sessions,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000 // MAX(n) AS BIGINT)
       |    AS bounce_permille,
       |  CAST(MIN(CASE WHEN re = (n + 1) // 2 THEN n_events END) AS BIGINT) AS median_events,
       |  CAST(MIN(CASE WHEN rd = (n + 1) // 2 THEN dur_ns END) AS BIGINT) AS median_duration_ns
       |FROM rk""".stripMargin

  /** Q126 — funnel stage LATENCY (the time-to-convert companion of q90:
    * q90 says who reached which stage; this says how long each
    * transition takes): per transition of the view→click→click→purchase
    * chain, the completing users' exact lower-median duration (order
    * statistic at rank (n+1) div 2 — no interpolation, replays as an
    * integer) and the truncated mean in ns. The funnel fold is the q90
    * one-scan-one-exchange operator; everything after it is
    * 3-transition-key work. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = Sessions.funnel(Tables.events(spark, dir), "user_id", "ts",
      "event_type", Seq("view", "click", "click", "purchase"))
    val durs = f.select(explode(array(
      struct(lit("1_view_to_click1").as("transition"),
        (col("st")(1) - col("st")(0)).as("d")),
      struct(lit("2_click1_to_click2").as("transition"),
        (col("st")(2) - col("st")(1)).as("d")),
      struct(lit("3_click2_to_purchase").as("transition"),
        (col("st")(3) - col("st")(2)).as("d")))).as("t"))
      .select(col("t.transition").as("transition"), col("t.d").as("d"))
      .filter(col("d").isNotNull)
    durs
      .withColumn("r", row_number().over(
        Window.partitionBy(col("transition")).orderBy(col("d"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("transition"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy(col("transition"))
      .agg(max(col("n")).as("n"),
        min(when(col("r") === expr("(n + 1) div 2"), col("d"))).as("median_ns"),
        expr("sum(d) div max(n)").as("mean_ns"))
      .orderBy(col("transition"))
  }

  val funnelLatencySql: String =
    s"""WITH f AS (SELECT * FROM (
       |$funnelStagesSql
       |) q),
       |d AS (
       |  SELECT '1_view_to_click1' AS transition, click1_ns - view_ns AS d
       |  FROM f WHERE click1_ns IS NOT NULL
       |  UNION ALL
       |  SELECT '2_click1_to_click2', click2_ns - click1_ns
       |  FROM f WHERE click2_ns IS NOT NULL
       |  UNION ALL
       |  SELECT '3_click2_to_purchase', purchase_ns - click2_ns
       |  FROM f WHERE purchase_ns IS NOT NULL),
       |r AS (
       |  SELECT transition, d,
       |    row_number() OVER (PARTITION BY transition ORDER BY d) AS r,
       |    COUNT(*) OVER (PARTITION BY transition) AS n
       |  FROM d)
       |SELECT transition, CAST(MAX(n) AS BIGINT) AS n,
       |  CAST(MIN(CASE WHEN r = (n + 1) // 2 THEN d END) AS BIGINT) AS median_ns,
       |  CAST(SUM(d) // MAX(n) AS BIGINT) AS mean_ns
       |FROM r GROUP BY transition ORDER BY transition""".stripMargin

  /** Q99 — KMV/theta sketch set operations (Sketches.kmvSketch):
    * per-event-type audience sketches over user ids, then pairwise
    * union / intersection / Jaccard ESTIMATES from the merged k-mins —
    * the set algebra HLL cannot do — with the exact intersection
    * alongside (the q88 sketch-vs-exact audit convention). Integer-
    * exact throughout: portable 60-bit hashes, fixed-point estimators
    * (DECIMAL(38) vs the oracle's HUGEINT for the 2⁶⁸ numerators), so
    * every estimate replays bit-for-bit. */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val ev = Tables.events(spark, dir)
    val sk = Sketches.kmvSketch(ev, "event_type", col("user_id"), k = 128)
      .localCheckpoint(true) // three consumers: estimates + both pair sides
    val est = Sketches.kmvEstimate(sk, 128)
    val pairs = sk.select(col("set").as("type_a"), col("hs").as("hs_a"))
      .crossJoin(broadcast(sk.select(col("set").as("type_b"), col("hs").as("hs_b"))))
      .filter(col("type_a") < col("type_b"))
    val stats = Sketches.kmvPairStats(pairs, 128)
    val du = ev.select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(true) // both sides of the exact-intersection join
    val exact = du.as("a")
      .join(du.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    stats
      .join(est.select(col("set").as("type_a"), col("est_distinct").as("est_a")), Seq("type_a"))
      .join(est.select(col("set").as("type_b"), col("est_distinct").as("est_b")), Seq("type_b"))
      .join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"), col("jaccard_permille"),
        col("exact_intersect"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val kmvOverlapSql: String =
    """WITH d AS (
      |  SELECT DISTINCT event_type AS s,
      |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM events),
      |rk AS (SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM d),
      |sk AS (SELECT s, list(h ORDER BY h) AS hs FROM rk WHERE rn <= 128 GROUP BY s),
      |est AS (
      |  SELECT s, CASE WHEN len(hs) < 128 THEN len(hs)
      |    ELSE CAST((127::HUGEINT * 1152921504606846976) // hs[128] AS BIGINT) END AS est
      |  FROM sk),
      |pr AS (
      |  SELECT a.s AS type_a, b.s AS type_b, a.hs AS ha, b.hs AS hb
      |  FROM sk a JOIN sk b ON a.s < b.s),
      |m AS (
      |  SELECT type_a, type_b, ha, hb,
      |    list_sort(list_distinct(list_concat(ha, hb)))[1:128] AS u
      |  FROM pr),
      |st AS (
      |  SELECT type_a, type_b, len(u) AS n_union_held,
      |    len(list_filter(u, v -> list_contains(ha, v) AND list_contains(hb, v))) AS n_both,
      |    CASE WHEN len(u) < 128 THEN len(u)
      |      ELSE CAST((127::HUGEINT * 1152921504606846976) // u[128] AS BIGINT) END AS est_union
      |  FROM m),
      |du AS (SELECT DISTINCT event_type, user_id FROM events),
      |ex AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS exact_intersect
      |  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT st.type_a, st.type_b, ea.est AS est_a, eb.est AS est_b,
      |  st.est_union,
      |  CAST(CASE WHEN st.n_union_held < 128 THEN st.n_both
      |    ELSE (st.n_both::HUGEINT * st.est_union) // 128 END AS BIGINT) AS est_intersect,
      |  CAST(st.n_both * 1000 // st.n_union_held AS BIGINT) AS jaccard_permille,
      |  ex.exact_intersect
      |FROM st
      |JOIN est ea ON ea.s = st.type_a
      |JOIN est eb ON eb.s = st.type_b
      |JOIN ex ON ex.type_a = st.type_a AND ex.type_b = st.type_b
      |ORDER BY st.type_a, st.type_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q99_kmv_overlap", kmvOverlap, Some(kmvOverlapSql)),
    QueryDef("q1_latest_state", latestState, Some(latestStateSql)),
    QueryDef("q90_funnel_stages", funnelStages, Some(funnelStagesSql)),
    QueryDef("q126_funnel_latency", funnelLatency, Some(funnelLatencySql)),
    QueryDef("q5_interval_join", intervalJoin, Some(intervalJoinSql)),
    QueryDef("q6_session_windows", sessionWindows, Some(sessionWindowsSql)),
    QueryDef("q144_session_stats", sessionStats, Some(sessionStatsSql)),
    QueryDef("q27_asof_join", asofJoin, Some(asofJoinSql)),
    QueryDef("q28_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q50_scd2", scd2Snapshot, Some(scd2SnapshotSql)),
    QueryDef("q53_funnel", funnel, Some(funnelSql)))
}
