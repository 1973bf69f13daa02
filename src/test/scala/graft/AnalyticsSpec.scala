package graft

import org.apache.spark.sql.functions._
import graft.ops.{Merge, Resample, TrainingPrep}

/** Round-3 operators: CDC merge, gap-fill resampling, stratified
  * sampling, bigram-LM scoring. */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  test("Merge.applyChangeSet: kept / updated / deleted / inserted row fates") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "U", 5.0),   // update
      (3L, "D", 0.0),   // delete
      (9L, "U", 7.0),   // insert
      (8L, "D", 0.0))   // delete of absent key: no-op
      .toDF("k", "op", "delta")
    val out = Merge.applyChangeSet(base, changes, "k", "op", Seq(
      "name" -> coalesce(col("name"), lit("NEW")),
      "bal" -> when(col("op").isNull, col("bal"))
        .otherwise(coalesce(col("bal"), lit(0.0)) + col("delta"))))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, "a", 10.0, "kept"),
      (2L, "b", 25.0, "updated"),
      (9L, "NEW", 7.0, "inserted")))
  }

  test("Resample.gapFill: densifies per-key grid and forward-fills") {
    // key 1: buckets 10, 13 observed -> grid 10..13 with 11, 12 as gaps
    val ev = Seq(
      (1L, 10L * 100, 1.0), (1L, 10L * 100 + 50, 2.0), (1L, 13L * 100, 7.0),
      (2L, 20L * 100, 9.0))
      .toDF("k", "ts", "v")
    val out = Resample.gapFill(ev, "k", "ts", bucketNs = 100L, "v", c => sum(c))
      .orderBy("k", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(out.toSeq === Seq(
      (1L, 10L, 2L, 3.0, 0),
      (1L, 11L, 0L, 3.0, 1),
      (1L, 12L, 0L, 3.0, 1),
      (1L, 13L, 1L, 7.0, 0),
      (2L, 20L, 1L, 9.0, 0)))
  }

  test("stratifiedSample: exactly k per stratum, deterministic, prefix-nested") {
    val docs = (1L to 400L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "s")
    val k5 = TrainingPrep.stratifiedSample(docs, "s", "id", k = 5)
      .select("s", "id", "sample_rank").collect()
    assert(k5.count(_.getString(0) == "a") === 5)
    assert(k5.count(_.getString(0) == "b") === 5)
    // deterministic re-run
    val again = TrainingPrep.stratifiedSample(docs, "s", "id", k = 5)
      .select("s", "id", "sample_rank").collect()
    assert(k5.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
    // growing k keeps previous members (reservoir prefix property)
    val k10 = TrainingPrep.stratifiedSample(docs, "s", "id", k = 10)
      .select("s", "id").collect().map(_.toSeq).toSet
    assert(k5.map(r => Seq(r.get(0), r.get(1))).forall(k10.contains))
    // two-phase result == single-window ground truth
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.TextFunctions.portableHash60(
      concat(col("id").cast("string"), lit(":strat")))
    val truth = docs.withColumn("h", h)
      .withColumn("r", row_number().over(Window.partitionBy(col("s")).orderBy(col("h"), col("id"))))
      .filter(col("r") <= 5).select("s", "id").collect().map(_.toSeq).toSet
    assert(k5.map(r => Seq(r.get(0), r.get(1))).toSet === truth)
  }

  test("bigram LM scoring: common transitions outscore rare ones") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat"),
      (4L, "zq xv"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("bigram_docs")
    // inline the query's core over a temp frame
    val bg = docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))"))
        .as("bg"))
    val counts = bg.groupBy("bg").agg(count(lit(1)).as("c"))
    val scored = bg.join(counts, Seq("bg")).groupBy("doc_id")
      .agg(sum(length(bin(col("c"))) - 1).as("lm"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("rare"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 'the cat' count=3 -> floor(log2 3)=1; 'cat sat' count=2 -> 1; doc1 lm=2
    assert(scored(1L) === ((2L, 0L)))
    // doc4: single bigram with count 1 -> lm 0, rare 1
    assert(scored(4L) === ((0L, 1L)))
  }

  test("funnel: greedy chain, no stage skipping, repeated stages, strict ordering") {
    import graft.ops.Sessions
    val events = Seq(
      // user 1 completes view(10) -> click(20) -> click(30) -> buy(40);
      // the click at 15 is consumed as stage 2, so stage 3 takes 20
      (1L, 10L, "view"), (1L, 15L, "click"), (1L, 20L, "click"),
      (1L, 40L, "buy"),
      // user 2: click BEFORE any view must not count; chain starts at 50
      (2L, 5L, "click"), (2L, 50L, "view"), (2L, 60L, "click"),
      // user 3: same-ts click as the view — strict > excludes it
      (3L, 10L, "view"), (3L, 10L, "click"),
      // user 4: nothing relevant
      (4L, 10L, "buy")).toDF("user_id", "ts", "event_type")
    val res = Sessions.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Any](2).map(Option(_))))).toMap
    assert(res(1L) == ((4, Seq(Some(10L), Some(15L), Some(20L), Some(40L)))),
      s"user 1: ${res(1L)}")
    assert(res(2L) == ((2, Seq(Some(50L), Some(60L), None, None))), s"user 2: ${res(2L)}")
    assert(res(3L) == ((1, Seq(Some(10L), None, None, None))), s"user 3: ${res(3L)}")
    assert(res(4L) == ((0, Seq(None, None, None, None))), s"user 4: ${res(4L)}")
  }

  test("funnel plan: one scan, one exchange — no per-stage join cascade") {
    import graft.ops.Sessions
    val events = Seq((1L, 10L, "view")).toDF("user_id", "ts", "event_type")
    val plan = Sessions.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click")).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 exchange, got $shuffles in:\n$plan")
    assert(!plan.contains("Join"), s"no joins expected:\n$plan")
  }

  private def trendOf(rows: (Long, Long, Double)*): Map[Long, (Long, Option[Long])] =
    graft.ops.Trend.linearTrend(
      rows.toDF("user_id", "ts", "value"),
      Seq("user_id"), col("ts"), col("value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("linearTrend: exact slopes in micro-units per second") {
    val ns = 1000000000L
    val out = trendOf(
      // user 1: y = 2x + 1 -> slope exactly 2e6
      (1L, 0L, 1.0), (1L, ns, 3.0), (1L, 2 * ns, 5.0),
      // user 2: x = 0,1,3 s; y = 1e-4,0,0 -> slope_e6 = -400/14 = -28.57…,
      // truncation -28 (floor would give -29 — the discriminator)
      (2L, 0L, 0.0001), (2L, ns, 0.0), (2L, 3 * ns, 0.0),
      // user 3: one distinct second -> null slope, row kept
      (3L, 0L, 7.0), (3L, 1L, 9.0))
    assert(out(1L) === ((3L, Some(2000000L))), s"exact slope: $out")
    assert(out(2L) === ((3L, Some(-28L))),
      s"negative slope must truncate toward zero: $out")
    assert(out(3L) === ((2L, None)), s"degenerate key keeps a null-slope row: $out")
  }

  test("linearTrend: sub-second jitter is truncated to the second grid") {
    val ns = 1000000000L
    // same seconds as user 1 above, with nanosecond jitter inside them
    val out = trendOf(
      (1L, 5L, 1.0), (1L, ns + 999999L, 3.0), (1L, 2 * ns + 17L, 5.0))
    assert(out(1L) === ((3L, Some(2000000L))), s"jitter must not move x: $out")
  }

  test("attribution frame: same-timestamp touch excluded by value, lookback bounds respected") {
    // replicate the q122 window semantics on a hand stream via the query's
    // own RANGE frame: a view at the SAME ns as the purchase must NOT
    // count (frame ends at 1ns preceding); a view 8 days before must NOT
    // count (outside the 7-day lookback); one 1ns before must count
    val ns = 1000000000L
    val day = 86400L * ns
    val rows = Seq(
      (1L, 100L * ns, "view"), (1L, 100L * ns, "purchase"), // same-ts: no touch
      (2L, 100L * ns - 8 * day, "view"), (2L, 100L * ns, "purchase"), // too old
      (3L, 100L * ns - 1, "click"), (3L, 100L * ns, "purchase")) // counts
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-7L * day, -1L)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val out = rows.toDF("user_id", "ts", "event_type")
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), coalesce(col("lt"), lit("none")))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "none", 2L -> "none", 3L -> "click"), s"got $out")
  }

  test("winsorized order-statistic bounds: rank ceil(p*n) picks existing values") {
    // 100 values 1..100: p05 rank = ceil(5) = 5 -> value 5; p95 rank = 95
    val n = 100
    val lo = (5 * n + 99) / 100
    val hi = (95 * n + 99) / 100
    assert(lo == 5 && hi == 95)
    // 7 values: p05 rank ceil(0.35) = 1, p95 rank ceil(6.65) = 7 — the
    // bounds degrade to min/max, never out of range
    assert((5 * 7 + 99) / 100 == 1 && (95 * 7 + 99) / 100 == 7)
  }

  test("cusumSplit: planted step found, constant series ties to earliest, 1-bucket key null") {
    val rows =
      // key a: 10.0/bucket for 1-3, 20.0/bucket for 4-6 (two events of 10 each)
      (1L to 3L).map(b => ("a", b, 10.0)) ++
        (4L to 6L).flatMap(b => Seq(("a", b, 10.0), ("a", b, 10.0))) ++
        // key b: constant -> all deviations 0, tie must pick the EARLIEST bucket
        (1L to 3L).map(b => ("b", b, 5.0)) ++
        Seq(("c", 1L, 9.0)) // single bucket: null split, census row kept
    val out = graft.ops.ChangePoint.cusumSplit(
      rows.toDF("k", "b", "v"), Seq("k"), col("b"), col("v"))
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a: S_t(e4) = 1e5,2e5,3e5,5e5,7e5,9e5; D_t = |S_t*6 - 9e5*t| peaks
    // at t=3 (9e5) -> split bucket 3, dev_e4 = 9e5 div 6 = 150000
    assert(out("a") === ((6L, Some(3L), Some(150000L))), s"planted step: $out")
    assert(out("b") === ((3L, Some(1L), Some(0L))), s"tie -> earliest: $out")
    assert(out("c") === ((1L, None, None)), s"1-bucket key: $out")
  }

  test("k-anonymity census: brute-force replay, monotone in k, l bounded by sensitive domain") {
    val got = graft.queries.AnalyticsQueries.kAnonymity(spark, sf())
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // plain-Scala replay from the raw table
    val rows = graft.sources.Tables.customer(spark, sf())
      .select(col("c_nationkey"), col("c_mktsegment"), (col("c_acctbal") < 0).as("d"))
      .as[(Long, String, Boolean)].collect()
    val classes = rows.groupBy(r => (r._1, r._2)).values
      .map(g => (g.size.toLong, g.map(_._3).distinct.size.toLong)).toSeq
    val n = classes.map(_._1).sum
    val expect = Seq(2L, 5L, 10L, 25L, 50L).map { k =>
      val below = classes.filter(_._1 < k)
      val safe = classes.filter(_._1 >= k)
      (k, below.size.toLong, below.map(_._1).sum,
        below.map(_._1).sum * 1000000L / n,
        if (safe.isEmpty) 0L else safe.map(_._2).min)
    }
    assert(got === expect)
    // structural invariants: rows-below monotone nondecreasing in k,
    // l-diversity of binary sensitive attribute never exceeds 2
    assert(got.map(_._3) === got.map(_._3).sorted)
    assert(got.forall(_._5 <= 2L))
  }

  test("BPE fertility: exact weighted rollup of the per-document q83 encoding") {
    val perDoc = graft.queries.TextQueries.bpeEncode(spark, sf())
      .join(graft.sources.Tables.documents(spark, sf())
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("w"), sum("n_subwords").as("s"))
      .select(col("lang"), col("n_docs"), col("w"), col("s"),
        expr("s * 1000 div w"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = graft.queries.TextQueries.bpeFertility(spark, sf())
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === perDoc)
    // every merge strictly reduces or preserves token count: fertility is
    // bounded above by characters-as-tokens and below by 1000/kiloword
    assert(got.forall(r => r._5 >= 1000L))
  }
}
