package graft

import org.apache.spark.sql.functions._

/** Cardinality-sketch accuracy: both the built-in HLL++ and the portable
  * md5-register HLL (ops.Sketches) must land near the exact count. */
class ApproxSpec extends SparkSpec {

  test("portable HLL within 15% of exact (m=256 → se ≈ 6.5%)") {
    val rows = graft.queries.Relational.approxDistinct(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val hll = r.getDouble(2)
      assert(exact > 2.5 * 256, s"exact $exact below raw-HLL regime — q25 input shrank")
      assert(math.abs(hll - exact) / exact < 0.15,
        s"${r.getString(0)}: hll $hll vs exact $exact")
    }
  }

  test("built-in approx_count_distinct within 5% of exact") {
    val rows = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("count-min: estimates dominate true counts and stay within bound") {
    val rows = graft.queries.Relational.heavyHitters(spark, sf("sf0.01")).collect()
    assert(rows.length == 10)
    val n = graft.sources.Tables.lineitem(spark, sf("sf0.01")).count()
    rows.foreach { r =>
      val (truth, est) = (r.getLong(1), r.getLong(2))
      assert(est >= truth, s"CM must never underestimate: $r")
      // standard bound: overestimate <= 2e/w * N (w = 1024) — loose but real
      assert(est - truth <= 2 * math.E / 1024 * n + 1, s"overestimate too large: $r (n=$n)")
    }
  }

  test("count-min sketches merge by cellwise sum: union == merged") {
    import spark.implicits._
    val a = (1 to 2000).map(i => s"k${i % 50}").toDF("x")
    val b = (1 to 1000).map(i => s"k${i % 20}").toDF("x")
    val direct = graft.ops.Sketches.cmSketch(a.union(b), col("x"))
      .select("row", "bucket", "cnt")
    val merged = graft.ops.Sketches.cmSketch(a, col("x"))
      .union(graft.ops.Sketches.cmSketch(b, col("x")))
      .groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .select("row", "bucket", "cnt")
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty,
      "cell sets must be identical")
  }

  test("portable HLL registers merge by max: union sketch == sketch of union") {
    import spark.implicits._
    val a = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "x")
    val b = (2000 to 5000).map(i => ("g", s"v$i")).toDF("g", "x")
    val direct = graft.ops.Sketches.hllRegisters(a.union(b), Seq("g"), col("x"))
      .select("g", "bucket", "reg")
    val merged = graft.ops.Sketches
      .hllRegisters(a, Seq("g"), col("x"))
      .union(graft.ops.Sketches.hllRegisters(b, Seq("g"), col("x")))
      .groupBy(col("g"), col("bucket")).agg(max(col("reg")).as("reg"))
      .select("g", "bucket", "reg")
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty,
      "register sets must be identical")
    val est = graft.ops.Sketches.hllEstimate(merged, Seq("g"))
      .select(col("hll_est")).head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"merged estimate $est vs 5000")
  }

  test("log-histogram quantiles: bounds bracket exact percentiles, halves merge losslessly") {
    import graft.ops.Sketches
    val spark2 = spark
    import spark2.implicits._
    val ev = graft.sources.Tables.events(spark, sf())
      .select(col("event_type"), col("value"))
    // the reported bound is the upper edge of the bucket holding the
    // DISCRETE p-th order statistic d: d ≤ ub ≤ 2d+1 (half-power-of-two
    // resolution). Compare against the true order stat, not Spark's
    // interpolated percentile (interpolation can sit below the order
    // stat's bucket).
    val hist = Sketches.logHistogram(ev, Seq("event_type"), col("value"))
    val qs = Sketches.histogramQuantiles(hist, Seq("event_type"), Seq(50, 99))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val byType = ev.as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    byType.foreach { case (k, vs) =>
      def orderStat(p: Int): Double = vs((math.ceil(p / 100.0 * vs.length) - 1).toInt)
      val (ub50, ub99) = qs(k)
      val (d50, d99) = (orderStat(50), orderStat(99))
      assert(ub50 >= d50.floor && ub50 <= 2 * d50 + 1, s"$k p50: $ub50 vs order stat $d50")
      assert(ub99 >= d99.floor && ub99 <= 2 * d99 + 1, s"$k p99: $ub99 vs order stat $d99")
    }
    // mergeability: histograms of two halves, bucketwise-summed, equal the
    // whole-corpus histogram (the property that lets 1000 executors /
    // daily partitions combine losslessly)
    val a = Sketches.logHistogram(ev.filter($"value" < 50), Seq("event_type"), col("value"))
    val b = Sketches.logHistogram(ev.filter($"value" >= 50), Seq("event_type"), col("value"))
    val mergedHist = a.unionByName(b)
      .groupBy($"event_type", $"bucket").agg(sum($"n").as("n"))
    assert(mergedHist.exceptAll(hist).isEmpty && hist.exceptAll(mergedHist).isEmpty,
      "half-histograms must merge to the full histogram")
  }

  test("KMV sketch: exact below k, ~accurate above, pair algebra on known overlap") {
    import spark.implicits._
    import graft.ops.Sketches
    // set A = 0..999, set B = 500..1499 → |A|=|B|=1000, |A∩B|=500, |A∪B|=1500
    val rows = (0 until 1000).map(i => ("a", i.toLong)) ++
      (500 until 1500).map(i => ("b", i.toLong)) ++
      (0 until 10).map(i => ("tiny", i.toLong))
    val df = rows.toDF("s", "v")
    val sk = Sketches.kmvSketch(df, "s", col("v"), k = 128)
    val est = Sketches.kmvEstimate(sk, 128).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("tiny") === 10L, "below-k sketch must be exact")
    // k=128 → se ≈ 1/sqrt(126) ≈ 9%; allow 25%
    assert(math.abs(est("a") - 1000L) <= 250, s"est(a)=${est("a")}")
    assert(math.abs(est("b") - 1000L) <= 250, s"est(b)=${est("b")}")
    val pairs = sk.filter(col("set") === "a")
      .select(col("hs").as("hs_a"), lit("a").as("type_a"))
      .crossJoin(sk.filter(col("set") === "b").select(col("hs").as("hs_b")))
    val st = Sketches.kmvPairStats(pairs, 128).head()
    val estUnion = st.getAs[Long]("est_union")
    val estInter = st.getAs[Long]("est_intersect")
    val jac = st.getAs[Long]("jaccard_permille")
    assert(math.abs(estUnion - 1500L) <= 400, s"est_union=$estUnion")
    assert(math.abs(estInter - 500L) <= 250, s"est_intersect=$estInter")
    assert(jac > 150 && jac < 550, s"jaccard_permille=$jac (true 333)")
  }
}
