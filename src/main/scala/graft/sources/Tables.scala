package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets parquet
  * filter pushdown and column pruning for free; callers should `select`
  * only what they need so `ReadSchema` stays narrow.
  *
  * The reference engine's "tables" are Kafka topics
  * (reference: pipeline/src/main/kotlin/pipeline/impl/KafkaIntelligencePipeline.kt:42-47);
  * here the batch surface is parquet and the streaming surface is
  * `graft.streaming` over the same schemas.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); with `nanosAsLong` it loads as
    * a Long of epoch-nanoseconds. We keep it as a Long on purpose: all
    * event-time operators (sessionization gap math, interval joins) then run
    * on exact integer arithmetic, matching the DuckDB oracle bit-for-bit.
    *
    * DuckDB reads the same column as a µs TIMESTAMP (its `epoch_ns` then
    * ends in 000), so for oracle parity we truncate to µs resolution while
    * staying in ns units. Integer `div` — a double division would lose
    * precision at 1.7e18.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    GraftSession.ensureRuntimeConfs(s)
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("(ts div 1000) * 1000"))
  }
}
