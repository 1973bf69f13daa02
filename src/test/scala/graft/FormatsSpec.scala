package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage: the engine's tables must survive
  * round-trips through the interchange formats a 100 TB deployment
  * actually meets at its edges (JSON for wire/event payloads — the
  * reference's serialization, SURVEY §1.3 — and CSV for legacy feeds),
  * with parquet as the canonical columnar store. Values, not just
  * schemas: every row must come back bit-identical. */
class FormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val docs = {
    spark.catalog.clearCache()
    graft.sources.Tables.documents(spark, sf()).orderBy("doc_id")
  }

  test("documents round-trip through JSON losslessly") {
    val dir = tmp("fmt_json")
    docs.write.mode("overwrite").json(dir)
    // explicit schema on read: schema inference over JSON is a full
    // extra pass at scale AND can widen types (long->double) silently
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("documents round-trip through CSV with explicit schema") {
    val dir = tmp("fmt_csv")
    // documents text contains no quotes/newlines in the corpus, but
    // escape/quote options are what production would pin anyway
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir)
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .schema(docs.schema).csv(dir)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("events JSON wire round-trip preserves exact ns timestamps") {
    spark.catalog.clearCache()
    // the ns-long form IS the wire contract (epoch ns, exact integers)
    val ev = graft.sources.Tables.events(spark, sf())
    val dir = tmp("fmt_events_json")
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("partitioned parquet writes prune at the scan (partition pushdown)") {
    val dir = tmp("fmt_part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val p = one.queryExecution.executedPlan.toString
    val pf = p.split("\n").find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"no partition filter: $pf")
    assert(one.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }
}
