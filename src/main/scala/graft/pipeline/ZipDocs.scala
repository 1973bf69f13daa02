package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Kernel output row: one parse outcome per record. Top-level so the
  * product encoder resolves without a TypeTag lookup inside the object. */
case class ZipParsed(
    id: Long,
    parse_error: Option[String],
    parsed_text: Option[String],
    n_entries: Option[Long],
    n_bytes: Option[Long])

/** REAL container-document parsing — the `.docx` analog of the
  * reference's defining fixture (a Word document through Tika:
  * pipeline/src/test/kotlin/integrationtests/KafkaIntelligencePipelineTests.kt:352-361,
  * test3.docx). A `.docx` IS a ZIP container whose main part is
  * `word/document.xml`; `java.util.zip` ships in the JDK, so both the
  * writer and the parser here run a genuine OOXML-shaped container
  * format with zero external libraries — this upgrades the B2/B3
  * capability from the synthetic GRFT layout to a real-world one.
  *
  * Writer: STORED (uncompressed) entries with preset size/CRC — every
  * byte of the archive is a deterministic function of the text, so the
  * DuckDB oracle can pin the total archive size as
  * `encode("").length + octet_length(text)` (no compressor variance).
  *
  * Parser: a mapPartitions kernel walking local headers via
  * `ZipInputStream` (the per-record JVM call is unavoidable for a
  * container format — same posture as the PNG codec,
  * Multimodal.ImageCodec); entry CRCs are verified by the stream, the
  * main part's XML is reduced to its `<w:t>` runs, and entities are
  * unescaped. Errors isolate per record (`bad-zip` / `missing-entry` /
  * `missing-content`) — the A19 contract: at 100 TB some fraction of any
  * crawl IS corrupt, and one bad container must never fail the job.
  * Content bytes are resolved by a path-keyed join and never visit the
  * driver.
  */
object ZipDocs {

  /** The OOXML main part. */
  val DocumentEntry = "word/document.xml"

  private val ContentTypesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
      """</Types>"""

  private val RelsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
      """</Relationships>"""

  private val DocPrefix =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:body><w:p><w:r><w:t>"""

  private val DocSuffix = "</w:t></w:r></w:p></w:body></w:document>"

  /** Entry count of every archive this writer produces. */
  val EntryCount = 3L

  def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def unescapeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  /** Fixed 2020-06-01T12:00Z — inside the DOS-time range, so the JDK
    * writer emits NO extended-timestamp extra field and entry sizes stay
    * closed-form. */
  private val FixedEntryTime = 1590998400000L

  /** Write a docx-shaped archive: `[Content_Types].xml`, `_rels/.rels`,
    * `word/document.xml` with the text as one `<w:t>` run. STORED
    * entries (size/CRC preset → no data descriptors), so the byte layout
    * is exactly: per entry a 30+name local header and the raw payload,
    * then 46+name central records and the 22-byte end-of-central-
    * directory — total = `encode("").length + len(escaped text)`. */
  def encode(text: String): Array[Byte] = {
    import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}
    val baos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(baos)
    def put(name: String, payload: Array[Byte]): Unit = {
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(payload.length.toLong)
      e.setCompressedSize(payload.length.toLong)
      val crc = new CRC32(); crc.update(payload); e.setCrc(crc.getValue)
      e.setTime(FixedEntryTime)
      zos.putNextEntry(e); zos.write(payload); zos.closeEntry()
    }
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    put("[Content_Types].xml", ContentTypesXml.getBytes(utf8))
    put("_rels/.rels", RelsXml.getBytes(utf8))
    put(DocumentEntry, (DocPrefix + escapeXml(text) + DocSuffix).getBytes(utf8))
    zos.close()
    baos.toByteArray
  }

  /** Archive bytes minus the text payload — the oracle's size constant. */
  lazy val fixedOverheadBytes: Int = encode("").length

  private val WtRun = java.util.regex.Pattern.compile("(?s)<w:t[^>]*>(.*?)</w:t>")

  /** Extract the document text from the main part's XML: concatenate all
    * `<w:t>` runs, unescape entities. */
  def extractText(documentXml: String): String = {
    val m = WtRun.matcher(documentXml)
    val sb = new StringBuilder
    while (m.find()) sb.append(unescapeXml(m.group(1)))
    sb.toString
  }

  /** Walk the archive and extract the main part.
    * Returns (error, text, nEntries): error ∈ null | bad-zip (not a zip,
    * truncated, or an entry CRC mismatch — `ZipInputStream` verifies
    * stored CRCs on read) | missing-entry (a valid zip without
    * `word/document.xml`). */
  def parseZip(bytes: Array[Byte]): (String, String, Long) = {
    try {
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var n = 0L
      var doc: Array[Byte] = null
      val buf = new Array[Byte](8192)
      var e = zis.getNextEntry
      if (e == null) return ("bad-zip", null, 0L) // no local header at all
      while (e != null) {
        n += 1
        val out = new java.io.ByteArrayOutputStream()
        var r = zis.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = zis.read(buf) }
        if (e.getName == DocumentEntry) doc = out.toByteArray
        zis.closeEntry() // throws on CRC mismatch of the entry just read
        e = zis.getNextEntry
      }
      if (doc == null) ("missing-entry", null, n)
      else (null, extractText(new String(doc, java.nio.charset.StandardCharsets.UTF_8)), n)
    } catch { case _: Exception => ("bad-zip", null, 0L) }
  }

  private val MetaType = "struct<values:map<string,string>,createdBy:string>"
  private val ReprType = "struct<path:string,createdBy:string>"

  /** The container-parse producer, mirroring BinaryDocs.parseEvents:
    * resolve each record's representation pointer to bytes (path-keyed
    * LEFT join — a dangling pointer isolates as `missing-content`, not a
    * dropped row), parse the container on executors, and emit:
    *   - valid archive → UPSERT_REPRESENTATION (extracted text rendition)
    *                     + UPSERT_METADATA {n_entries, n_bytes, mime}
    *   - invalid       → UPSERT_METADATA {!error: reason} only (A19). */
  def parseEvents(records: Dataset[DataRecord], contentByPath: DataFrame,
      createdBy: String = "parse-zip", timestamp: Long = 2L): Dataset[DataRecordEvent] = {
    val spark = records.sparkSession
    import spark.implicits._
    val resolved = records.toDF()
      .select(col("id"), col("representation.path").as("path"))
      .join(contentByPath, Seq("path"), "left")
    val p = resolved.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null) ZipParsed(id, Some("missing-content"), None, None, None)
        else parseZip(bytes) match {
          case (null, text, n) =>
            ZipParsed(id, None, Some(text), Some(n), Some(bytes.length.toLong))
          case (err, _, _) => ZipParsed(id, Some(err), None, None, None)
        }
      }).toDF()

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
          map(lit("n_entries"), col("n_entries").cast("string"),
            lit("n_bytes"), col("n_bytes").cast("string"),
            lit("mime"), lit("application/zip")))
          .otherwise(map(lit("!error"), col("parse_error"))).as("values"),
        lit(createdBy).as("createdBy")).as("meta"))

    renditions.unionByName(metas).as[DataRecordEvent]
  }
}
