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

  test("documents round-trip through ORC losslessly (the other columnar store)") {
    val dir = tmp("fmt_orc")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
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

  test("events loader: TIMESTAMP_NTZ parquet ≡ legacy ns-Long parquet (µs-truncation contract, both forms)") {
    import spark.implicits._
    // The driver has generated events.ts as BOTH parquet TIMESTAMP(NANOS)
    // (loaded as an ns Long via nanosAsLong) and parquet timestamp[us]
    // (TIMESTAMP_NTZ). Property: for any epoch-µs instant — including
    // legacy rows carrying sub-µs ns digits — the loader yields the SAME
    // epoch-ns Long from either physical form.
    val rnd = new scala.util.Random(0xE7E27)
    val rows = (0 until 512).map { i =>
      // full plausible range incl. pre-1970 (negative epoch) instants.
      // Sub-µs ns digits exist ONLY in the legacy physical form (NANOS
      // column); both loader paths truncate toward zero like DuckDB's
      // ns→µs conversion, so pin the noise to non-negative instants where
      // trunc == floor and the cross-form identity is exact.
      val us = rnd.between(-2208988800000000L, 4102444800000000L)
      val sub = if (us >= 0) rnd.between(0L, 1000L) else 0L
      (i.toLong, us, sub) // (event_id, epoch_us, sub-µs ns)
    }
    val ntzDir = tmp("evnorm_ntz")
    rows.toDF("event_id", "us", "sub")
      .select(col("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    val legacyDir = tmp("evnorm_legacy")
    rows.toDF("event_id", "us", "sub")
      .select(col("event_id"), expr("us * 1000 + sub").as("ts"))
      .write.mode("overwrite").parquet(s"$legacyDir/events.parquet")

    val ntz = graft.sources.Tables.events(spark, ntzDir)
    val legacy = graft.sources.Tables.events(spark, legacyDir)
    // both normalize to LongType epoch-ns
    assert(ntz.schema("ts").dataType === LongType, "NTZ form must normalize to ns Long")
    assert(legacy.schema("ts").dataType === LongType, "legacy form must normalize to ns Long")
    val a = ntz.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val b = legacy.orderBy("event_id").select("event_id", "ts").collect().toSeq
    assert(a === b, "loader output diverged between physical schema forms")
    // and the values are the µs-truncated instants themselves
    val expected = rows.sortBy(_._1).map { case (id, us, _) => (id, us * 1000L) }
    assert(a.map(r => (r.getLong(0), r.getLong(1))) === expected)
  }

  test("Avro wire round-trips every event field and agrees with the JSON wire fold") {
    import spark.implicits._
    import graft.model._
    // exercise every optional-field combination the boundary carries
    val events = Seq(
      DataRecordEvent.create(1L, "doc-1",
        DocumentRepresentation("<p>x</p>", "inline"), 1L, 0L),
      DataRecordEvent.upsertMeta(1L,
        Metadata(Map("lang" -> "en", "n" -> "42"), "lang"), 2L, 1L),
      DataRecordEvent.upsertRepresentation(1L,
        DocumentRepresentation("/tmp/x.txt", "tika"), 3L, 0L),
      DataRecordEvent.create(2L, "doc-2",
        DocumentRepresentation(null, "inline"), 1L, 0L),
      DataRecordEvent(graft.model.Command.UpsertMetadata, 3L, 5L, 7L, None, None,
        Some(Metadata(Map.empty, "empty"))))
    val ds = events.toDS()
    val wire = graft.streaming.AvroWire.toWire(ds)
    // wire shape matches the JSON wire: (key, value) keyed by record id
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = graft.streaming.AvroWire.fromWire(wire).collect().toSet
    assert(back == events.toSet, s"avro round-trip diverged: $back")
    // and the binary form is materially smaller than the JSON wire value
    val avroBytes = wire.select(sum(length(col("value")))).head().getLong(0)
    val jsonBytes = graft.streaming.Streaming.toWire(ds)
      .select(sum(length(col("value")))).head().getLong(0)
    assert(avroBytes < jsonBytes,
      s"avro wire ($avroBytes B) not smaller than JSON wire ($jsonBytes B)")
  }

  test("registry wire envelope: magic + schema id round-trip, unknown id fails fast") {
    import spark.implicits._
    import graft.model._
    import graft.streaming.AvroWire
    val events = Seq(
      DataRecordEvent.create(7L, "doc-7",
        DocumentRepresentation("x y", "inline"), 1L, 0L),
      DataRecordEvent.upsertMeta(7L, Metadata(Map("k" -> "v"), "m"), 2L, 1L))
    val ds = events.toDS()
    val wire = AvroWire.toWire(ds, enveloped = true)
    // every value starts with the 5-byte registry header: magic 0x00 then
    // the schema id big-endian
    val heads = wire.select($"value").as[Array[Byte]].collect()
    heads.foreach { v =>
      assert(v(0) == AvroWire.WireMagic, "missing envelope magic")
      val id = ((v(1) & 0xFF) << 24) | ((v(2) & 0xFF) << 16) |
        ((v(3) & 0xFF) << 8) | (v(4) & 0xFF)
      assert(id == AvroWire.EventSchemaId, s"schema id $id")
    }
    assert(AvroWire.fromWire(wire, enveloped = true).collect().toSet == events.toSet)
    // an enveloped value decoded WITHOUT the envelope (and vice versa)
    // must not silently parse, and an unknown schema id must name itself
    val badId = heads.head.clone(); badId(4) = 99.toByte
    val err = intercept[org.apache.spark.SparkException] {
      AvroWire.fromWire(Seq(("7", badId)).toDF("key", "value"), enveloped = true).collect()
    }
    assert(err.getMessage.contains("unknown schema id 99") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown schema id 99")),
      s"unknown-id error unhelpful: ${err.getMessage}")
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
