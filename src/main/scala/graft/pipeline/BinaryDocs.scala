package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Binary-document parsing — the deterministic offline analog of the
  * reference's defining use case: crawl a directory, parse a real binary
  * document (there: Tika over .docx, reference:
  * pipeline/src/test/kotlin/integrationtests/KafkaIntelligencePipelineTests.kt:352-361),
  * and register the extracted text + metadata back through the pipeline
  * (reference producer loop: participants/implementations.kt:150-187).
  * No document parser ships in this container, so the binary format is
  * graft's own length-prefixed tagged layout ("GRFT"), but every pipeline
  * stage around it is the real one: binaryFile ingestion, pointer-style
  * content resolution, columnar parsing, error isolation, event-fold
  * registration.
  *
  * Wire layout (all integers big-endian):
  *   bytes 1-4    magic "GRFT"
  *   byte  5      version (0x01)
  *   bytes 6-9    payload byte length (uint32)
  *   bytes 10-..  UTF-8 payload
  *   last 4       CRC32 of the payload bytes
  *
  * Scale posture: the parse is entirely columnar (substring/hex/conv/
  * crc32 — all codegen'd); content bytes are resolved by a path-keyed
  * join and never visit the driver; malformed files degrade to `!error`
  * metadata per record (the A19 isolation posture) instead of failing
  * the job — at 100 TB some fraction of any crawl IS corrupt.
  */
object BinaryDocs {

  val Magic = "GRFT"
  /** magic + version + length prefix. */
  val HeaderLen = 9
  /** trailing CRC32. */
  val TrailerLen = 4

  /** JVM-side encoder — the fixture writer / any single-record producer.
    * The columnar parser below must invert this exactly. */
  def encode(text: String): Array[Byte] = {
    val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = java.nio.ByteBuffer.allocate(HeaderLen + payload.length + TrailerLen)
    bb.put(Magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put(1.toByte)
    bb.putInt(payload.length)
    bb.put(payload)
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    bb.putInt(crc.getValue.toInt) // low 32 bits; parser reads them unsigned
    bb.array()
  }

  /** Columnar GRFT parse of `contentCol` (binary). Adds:
    *   parse_error  — null when valid, else bad-magic | bad-version |
    *                  bad-length | crc-mismatch (first failing check wins)
    *   parsed_text  — UTF-8 payload (null on error)
    *   parsed_n_bytes — payload byte length (null on error)
    * Internally: fixed-offset fields via substring+hex+conv (codegen'd);
    * the CRC check recomputes crc32 over the payload slice and compares
    * against the stored trailer read unsigned. */
  def parsed(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = contentCol
    df
      .withColumn("__len", expr(s"length($c)"))
      .withColumn("__magic_ok",
        expr(s"$c is not null and length($c) >= ${HeaderLen + TrailerLen} " +
          s"and substring($c, 1, 4) = cast('$Magic' as binary)"))
      .withColumn("__ver", expr(s"cast(conv(hex(substring($c, 5, 1)), 16, 10) as int)"))
      .withColumn("__plen", expr(s"cast(conv(hex(substring($c, 6, 4)), 16, 10) as bigint)"))
      // the int cast must be overflow-proof BEFORE validation: a corrupted
      // high length byte declares plen ≥ 0x80000000, and `cast(__plen as
      // int)` in this projection would throw under ANSI on the whole scan
      // instead of isolating the row (found by the value-exhaustive fuzz).
      // Clamping to the actual byte count is semantics-free — any plen
      // above it fails the bad-length check, which compares the RAW __plen.
      .withColumn("__plen_c", expr(s"cast(least(__plen, cast(__len as bigint)) as int)"))
      .withColumn("__payload", expr(s"substring($c, ${HeaderLen + 1}, __plen_c)"))
      .withColumn("__crc_stored",
        expr(s"cast(conv(hex(substring($c, ${HeaderLen + 1} + __plen_c, " +
          s"$TrailerLen)), 16, 10) as bigint)"))
      .withColumn("parse_error",
        when(not(col("__magic_ok")), lit("bad-magic"))
          .when(col("__ver") =!= 1, lit("bad-version"))
          .when(col("__len") =!= col("__plen") + HeaderLen + TrailerLen, lit("bad-length"))
          .when(expr("crc32(__payload)") =!= col("__crc_stored"), lit("crc-mismatch")))
      .withColumn("parsed_text",
        when(col("parse_error").isNull, expr("cast(__payload as string)")))
      .withColumn("parsed_n_bytes",
        when(col("parse_error").isNull, col("__plen")))
      .drop("__len", "__magic_ok", "__ver", "__plen", "__plen_c", "__payload", "__crc_stored")
  }

  private val MetaType = "struct<values:map<string,string>,createdBy:string>"
  private val ReprType = "struct<path:string,createdBy:string>"

  /** The parse producer: resolve each record's representation pointer to
    * bytes (path-keyed join against `contentByPath` — the columnar form of
    * C4 file-backed content resolution), parse, and emit the events that
    * register the outcome:
    *   - valid file   → UPSERT_REPRESENTATION (extracted txt rendition)
    *                    + UPSERT_METADATA {n_bytes, version}
    *   - invalid file → UPSERT_METADATA {!error: reason} only — the A19
    *                    error-isolation contract; siblings are unaffected
    * `contentByPath` must carry (path, content) with paths matching the
    * records' representation paths. */
  def parseEvents(records: Dataset[DataRecord], contentByPath: DataFrame,
      createdBy: String = "parse-grft", timestamp: Long = 2L): Dataset[DataRecordEvent] = {
    val spark = records.sparkSession
    import spark.implicits._
    // LEFT join: a record whose pointer resolves to no content row is an
    // error to report, not a row to drop — the A19 contract covers the
    // dangling-pointer case too (a crawl at 100 TB WILL have files deleted
    // between listing and read).
    val resolved = records.toDF()
      .select(col("id"), col("representation.path").as("path"))
      .join(contentByPath, Seq("path"), "left")
    val p = parsed(resolved)
      .withColumn("parse_error",
        when(col("content").isNull, lit("missing-content"))
          .otherwise(col("parse_error")))

    val renditions = p.filter(col("parse_error").isNull).select(
      lit(Command.UpsertRepresentation).as("command"),
      col("id"),
      lit(timestamp).as("timestamp"),
      lit(0L).as("seq"),
      lit(null).cast("string").as("name"),
      struct(col("parsed_text").as("path"), lit(createdBy).as("createdBy"))
        .as("representation"),
      lit(null).cast(MetaType).as("meta"))

    val metas = p.select(
      lit(Command.UpsertMetadata).as("command"),
      col("id"),
      lit(timestamp).as("timestamp"),
      lit(1L).as("seq"),
      lit(null).cast("string").as("name"),
      lit(null).cast(ReprType).as("representation"),
      struct(
        when(col("parse_error").isNull,
          map(lit("n_bytes"), col("parsed_n_bytes").cast("string"),
            lit("version"), lit("1")))
          .otherwise(map(lit("!error"), col("parse_error"))).as("values"),
        lit(createdBy).as("createdBy")).as("meta"))

    renditions.unionByName(metas).as[DataRecordEvent]
  }
}
