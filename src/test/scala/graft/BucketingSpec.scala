package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Co-located join layout: two tables bucketed on the same key must join
  * with ZERO shuffle exchanges — the write-time partitioning IS the join
  * partitioning. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join and aggregate without a shuffle exchange") {
    val docs = Tables.documents(spark, sf()).select($"doc_id", $"lang")
    val stats = Tables.documents(spark, sf())
      .select($"doc_id", length($"text").cast("long").as("n_chars2"))
    Bucketing.saveBucketed(docs, "b_docs", "doc_id", buckets = 8)
    Bucketing.saveBucketed(stats, "b_stats", "doc_id", buckets = 8)
    // disable broadcast + AQE so the static plan shows the join mechanics
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle; got:\n$plan")
      assert(joined.count() == Tables.documents(spark, sf()).count())

      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("b_docs").groupBy($"doc_id").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "groupBy on the bucket key must not shuffle")
    }
  }
}
