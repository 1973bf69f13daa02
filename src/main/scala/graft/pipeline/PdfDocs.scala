package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Kernel output row: one parse outcome per record (top-level so the
  * product encoder resolves without a TypeTag lookup in the object). */
case class PdfParsed(
    id: Long,
    parse_error: Option[String],
    parsed_text: Option[String],
    n_streams: Option[Long],
    stream_filter: Option[String],
    n_bytes: Option[Long])

/** REAL PDF document parsing — the second real-world format after the
  * ZIP/OOXML container (ZipDocs), covering the other half of what the
  * reference's Tika participant ingests
  * (participants/implementations.kt:215-240 auto-detects the type of
  * every crawled file; PDF is the canonical "binary document with an
  * internal compressed structure"). Everything here is public-spec,
  * JDK-only: the PDF 1.4 COS object layout (header, numbered objects,
  * content streams, xref, trailer) and `FlateDecode`, which is zlib —
  * `java.util.zip.Deflater`/`Inflater` ship in the JDK, so the
  * compressed path is a GENUINE codec round-trip, not a stand-in.
  *
  * Writer: a minimal single-page document (Catalog → Pages → Page →
  * Contents stream + Type1 font) whose every cross-reference field is
  * fixed-width (`/Length`, the xref entries, and `startxref` are all
  * zero-padded to 10 digits — PDF integers permit leading zeros), so in
  * the UNCOMPRESSED form the total byte size is a closed-form function
  * of the text: `fixedOverheadBytes + len(escaped text)`. The DuckDB
  * oracle replays that size exactly. The `flate = true` form runs the
  * same bytes through a real zlib Deflater — its size is
  * compressor-version-specific, so size assertions apply only to the
  * plain form while TEXT round-trip assertions apply to both.
  *
  * Parser: a mapPartitions kernel (the per-record JVM call is the same
  * posture as the PNG codec and ZipDocs): validates the `%PDF-` header
  * and `%%EOF` trailer, walks every `<< … >> stream` object, slices the
  * data by the declared `/Length`, verifies the `endstream` keyword
  * lands where the length says it should, inflates `/FlateDecode`
  * streams, and extracts text by concatenating the literal-string
  * arguments of `Tj` show-text operators (with full escape handling:
  * `\\ \( \) \n \r \t \b \f` and octal). Errors isolate per record
  * (`bad-pdf` / `no-text` / `missing-content`) — the A19 contract: at
  * 100 TB some fraction of any crawl IS malformed, and one bad document
  * must never fail the job.
  */
object PdfDocs {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // ------------------------------------------------------------ strings

  /** PDF literal-string escaping (PDF 32000-1:2008 §7.3.4.2). */
  def escapeString(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Inverse of escapeString plus the spec's remaining forms (octal
    * `\ddd`, `\b`, `\f`, and "unknown escape = the char itself"). */
  def unescapeString(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0
            while (j < s.length && j < i + 4 &&
              s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------- codec

  /** zlib-wrap deflate — exactly what `/Filter /FlateDecode` means. */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end(); out.toByteArray
  }

  /** zlib inflate; throws on corrupt or truncated input. */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new java.util.zip.DataFormatException("truncated flate stream")
      out.write(buf, 0, n)
    }
    inf.end(); out.toByteArray
  }

  // ------------------------------------------------------------ writer

  private def contentOps(text: String): Array[Byte] =
    s"BT /F1 12 Tf 72 720 Td (${escapeString(text)}) Tj ET".getBytes(Latin1)

  /** Write a minimal single-page PDF 1.4 whose page content is one `Tj`
    * show-text operation. All offset-bearing integers are zero-padded to
    * 10 digits so the uncompressed layout is linear in the text length. */
  def encode(text: String, flate: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def put(s: String): Unit = { val b = s.getBytes(Latin1); out.write(b, 0, b.length) }
    val off = new Array[Int](6)
    put("%PDF-1.4\n")
    off(1) = out.size; put("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    off(2) = out.size; put("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    off(3) = out.size
    put("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    off(4) = out.size
    val raw = contentOps(text)
    val data = if (flate) deflate(raw) else raw
    val filter = if (flate) " /Filter /FlateDecode" else ""
    put(f"4 0 obj\n<< /Length ${data.length}%010d$filter >>\nstream\n")
    out.write(data, 0, data.length)
    put("\nendstream\nendobj\n")
    off(5) = out.size
    put("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = out.size
    put("xref\n0 6\n0000000000 65535 f \n")
    var i = 1
    while (i <= 5) { put(f"${off(i)}%010d 00000 n \n"); i += 1 }
    put(f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref%010d\n%%%%EOF\n")
    out.toByteArray
  }

  /** Uncompressed-form document bytes minus the text payload — the
    * oracle's size constant (the corpus is `[a-z0-9 ]` so escaping never
    * lengthens it). */
  lazy val fixedOverheadBytes: Int = encode("").length

  // ------------------------------------------------------------ parser

  /** A stream dict is flat (`<< /Length … [/Filter …] >>`), so a
    * no-'>' -inside match followed immediately by the stream keyword is
    * unambiguous; the page dict's nested `<< /Font … >>` never precedes
    * `stream`. */
  private val StreamDict =
    java.util.regex.Pattern.compile("<<([^>]*)>>\\s*stream\r?\n")
  private val LengthRe = java.util.regex.Pattern.compile("/Length\\s+(\\d+)")
  private val TjRe =
    java.util.regex.Pattern.compile("(?s)\\(((?:\\\\.|[^\\\\()])*)\\)\\s*Tj")

  /** Parse outcome: (error, text, nStreams, filter).
    * error ∈ null | bad-pdf (header/trailer missing, stream length out of
    * bounds, endstream displaced, flate corruption, or no content stream
    * at all) | no-text (structurally valid, zero Tj operators). filter ∈
    * "none" | "flate" (the last stream's filter; this writer emits one). */
  def parsePdf(bytes: Array[Byte]): (String, String, Long, String) = {
    try {
      val s = new String(bytes, Latin1)
      if (!s.startsWith("%PDF-")) return ("bad-pdf", null, 0L, null)
      if (!s.substring(math.max(0, s.length - 16)).contains("%%EOF"))
        return ("bad-pdf", null, 0L, null)
      val m = StreamDict.matcher(s)
      var nStreams = 0L
      var filterName = "none"
      val content = new StringBuilder
      while (m.find()) {
        nStreams += 1
        val dict = m.group(1)
        val lm = LengthRe.matcher(dict)
        if (!lm.find()) return ("bad-pdf", null, 0L, null)
        val len = lm.group(1).toInt
        val start = m.end
        if (start + len > bytes.length) return ("bad-pdf", null, 0L, null)
        // endstream must sit where /Length says (after optional EOL)
        var e = start + len
        while (e < s.length && (s.charAt(e) == '\r' || s.charAt(e) == '\n')) e += 1
        if (!s.startsWith("endstream", e)) return ("bad-pdf", null, 0L, null)
        var data = java.util.Arrays.copyOfRange(bytes, start, start + len)
        if (dict.contains("/FlateDecode")) { filterName = "flate"; data = inflate(data) }
        content.append(new String(data, Latin1))
      }
      if (nStreams == 0) return ("bad-pdf", null, 0L, null)
      val tj = TjRe.matcher(content.toString)
      val sb = new StringBuilder
      var found = false
      while (tj.find()) { found = true; sb.append(unescapeString(tj.group(1))) }
      if (!found) ("no-text", null, nStreams, filterName)
      else (null, sb.toString, nStreams, filterName)
    } catch { case _: Exception => ("bad-pdf", null, 0L, null) }
  }

  private val MetaType = "struct<values:map<string,string>,createdBy:string>"
  private val ReprType = "struct<path:string,createdBy:string>"

  /** The PDF-parse producer, mirroring ZipDocs.parseEvents: resolve each
    * record's representation pointer to bytes (path-keyed LEFT join — a
    * dangling pointer isolates as `missing-content`, not a dropped row),
    * parse on executors, and emit:
    *   - valid document → UPSERT_REPRESENTATION (extracted text) +
    *     UPSERT_METADATA {n_streams, n_bytes, filter, mime}
    *   - invalid        → UPSERT_METADATA {!error: reason} only (A19). */
  def parseEvents(records: Dataset[DataRecord], contentByPath: DataFrame,
      createdBy: String = "parse-pdf", timestamp: Long = 2L): Dataset[DataRecordEvent] = {
    val spark = records.sparkSession
    import spark.implicits._
    val resolved = records.toDF()
      .select(col("id"), col("representation.path").as("path"))
      .join(contentByPath, Seq("path"), "left")
    val p = resolved.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null) PdfParsed(id, Some("missing-content"), None, None, None, None)
        else parsePdf(bytes) match {
          case (null, text, n, f) =>
            PdfParsed(id, None, Some(text), Some(n), Some(f), Some(bytes.length.toLong))
          case (err, _, _, _) => PdfParsed(id, Some(err), None, None, None, None)
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
          map(lit("n_streams"), col("n_streams").cast("string"),
            lit("n_bytes"), col("n_bytes").cast("string"),
            lit("filter"), col("stream_filter"),
            lit("mime"), lit("application/pdf")))
          .otherwise(map(lit("!error"), col("parse_error"))).as("values"),
        lit(createdBy).as("createdBy")).as("meta"))

    renditions.unionByName(metas).as[DataRecordEvent]
  }
}
