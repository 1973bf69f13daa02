package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

import graft.ops.OrderStats

/** OrderStats = the scale-safe exact-rank kernel behind q124/q137/q141/
  * q144. Its contract is EQUALITY with the naive unpartitioned-window
  * formulation on every input — property-tested (seeded trials) against
  * skew, ties, negatives, and tiny/degenerate shapes the bucket map must
  * survive. */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic trial inputs: alternates a heavy-tie regime (few
    * distinct values over many rows — the straddle path) with a wide
    * near-unique regime (the settled path). */
  private def trialValues(rnd: Random): List[Long] = {
    val n = 1 + rnd.nextInt(60)
    if (rnd.nextBoolean()) List.fill(n)(rnd.between(-5L, 6L))
    else List.fill(n)(rnd.between(-1000000L, 1000001L))
  }

  test("cumHistogram matches the naive cumulative rank on arbitrary data") {
    val rnd = new Random(137)
    for (_ <- 1 to 40) {
      val vs = trialValues(rnd)
      val buckets = 1 + rnd.nextInt(8)
      val df = vs.toDF("v")
      val got = OrderStats.cumHistogram(df, "v", buckets = buckets)
        .select("v", "nv", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
      val naive = df.groupBy($"v").agg(count(lit(1)).as("nv"))
        .withColumn("cum", sum($"nv").over(
          Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == naive.toSeq, s"buckets=$buckets vs=$vs")
    }
  }

  test("cumHistogram grouped: per-group cumulative counts are exact") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 3L), ("b", -2L), ("b", -2L),
      ("b", -2L), ("b", 7L)).toDF("g", "v")
    val got = OrderStats.cumHistogram(df, "v", Seq("g"), buckets = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 2L, 2L), ("a", 3L, 1L, 3L),
      ("b", -2L, 3L, 3L), ("b", 7L, 1L, 4L)))
  }

  test("cumSums matches the naive running sums for several measures at once") {
    val rnd = new Random(139)
    for (_ <- 1 to 25) {
      val vs = trialValues(rnd)
      val buckets = 1 + rnd.nextInt(8)
      // one row per distinct v with two measures (the ksDistance shape)
      val df = vs.toDF("v").groupBy($"v")
        .agg(count(lit(1)).as("da"), sum(when($"v" % 2 === 0, 2L).otherwise(5L)).as("db"))
      val got = OrderStats.cumSums(df, "v", Seq("da", "db"), buckets = buckets)
        .select("v", "da", "db", "cum_da", "cum_db")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
      val naive = df
        .withColumn("cum_da", sum($"da").over(w))
        .withColumn("cum_db", sum($"db").over(w))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == naive.toSeq, s"buckets=$buckets vs=$vs")
    }
  }

  test("cumSums reduces duplicate value rows by summing their measures") {
    val df = Seq((3L, 1L), (3L, 10L), (1L, 4L), (2L, 2L)).toDF("v", "m")
    val got = OrderStats.cumSums(df, "v", Seq("m"))
      .select("v", "m", "cum_m").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 4L), (2L, 2L, 6L), (3L, 11L, 17L)))
  }

  test("rankBucket matches the naive tie-broken equal-frequency bucket") {
    val rnd = new Random(141)
    for (trial <- 1 to 40) {
      val vs = trialValues(rnd)
      val parts = Seq(2, 3, 4, 10)(rnd.nextInt(4))
      val df = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
      val got = OrderStats.rankBucket(df, "v", "id", parts, "b")
        .as[(Long, Long)].collect().sortBy(_._1)
      val naive = df
        .withColumn("r", row_number().over(Window.orderBy($"v", $"id")))
        .withColumn("n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select($"id", expr(s"(cast(r as long) - 1) * $parts div n + 1"))
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == naive.toSeq, s"trial=$trial parts=$parts vs=$vs")
    }
  }

  test("rankBuckets (multi-metric, one histogram pipeline) equals per-metric rankBucket") {
    val rnd = new Random(151)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(40)
      val rows = (0L until n.toLong).map(i =>
        (i, rnd.between(-5L, 6L), rnd.between(-1000L, 1001L), rnd.between(0L, 3L)))
      val df = rows.toDF("id", "m1", "m2", "m3")
      val parts = Seq(2, 3, 7)(rnd.nextInt(3))
      val got = OrderStats.rankBuckets(df,
        Seq("m1" -> "b1", "m2" -> "b2", "m3" -> "b3"), "id", parts)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      val want = OrderStats.rankBucket(df.select("m1", "id"), "m1", "id", parts, "b1")
        .join(OrderStats.rankBucket(df.select("m2", "id"), "m2", "id", parts, "b2"), "id")
        .join(OrderStats.rankBucket(df.select("m3", "id"), "m3", "id", parts, "b3"), "id")
        .select("id", "b1", "b2", "b3")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"trial=$trial parts=$parts")
    }
  }

  test("rankBucket emits every id exactly once (straddle/settled split is a partition)") {
    // all rows one tied value: the single group straddles every boundary
    val df = (0L until 20L).map(i => (42L, i)).toDF("v", "id")
    val got = OrderStats.rankBucket(df, "v", "id", 4, "b")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 20L))
    assert(got.map(_._2).toSeq == (0L until 20L).map(i => i * 4 / 20 + 1))
  }

  test("null values fail loudly instead of mis-ranking or silently dropping rows") {
    // NULLS FIRST (window) vs last-bucket (least() null routing) vs
    // equi-join drop (rankBucket) are three different wrong answers —
    // the kernel's contract is to refuse the question
    val df = Seq(Some(1L), None, Some(2L)).toDF("v")
    val ex = intercept[Exception] {
      OrderStats.cumHistogram(df, "v").collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null ranking is undefined")), ex.toString)
    val ex2 = intercept[Exception] {
      OrderStats.rankBucket(df.withColumn("id", monotonically_increasing_id()),
        "v", "id", 3, "b").collect()
    }
    assert(msgs(ex2).exists(_.contains("null ranking is undefined")), ex2.toString)
  }
}
