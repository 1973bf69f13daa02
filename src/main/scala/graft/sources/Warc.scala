package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (or one isolated parse failure). `payload` is
  * the raw record block — null on error rows; `skipped_bytes` counts the
  * bytes consumed while resynchronizing past a corrupt region. */
case class WarcRecord(
    path: String,
    rec_idx: Int,
    warc_type: String,
    record_id: String,
    target_uri: String,
    warc_date: String,
    content_type: String,
    content_length: Long,
    payload: Array[Byte],
    error: String,
    skipped_bytes: Long)

/** WARC (Web ARChive, ISO 28500) source — the Common-Crawl ingestion
  * format, and the de-facto standard container for LLM pretraining web
  * corpora. The reference ingests documents one file per record via a
  * directory walk (participants/implementations.kt:334-341); a crawl at
  * 100 TB ships instead as ~1 GB WARC segments, each a concatenation of
  * framed records:
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Record-ID: <urn:...>\r\n
  *   WARC-Date: ...\r\n
  *   WARC-Target-URI: http://...\r\n
  *   Content-Type: text/plain\r\n
  *   Content-Length: N\r\n
  *   \r\n
  *   <N payload bytes>\r\n\r\n
  *
  * `.warc.gz` files are a concatenation of per-record (or per-run) gzip
  * members; `GZIPInputStream` consumes multi-member streams natively.
  *
  * Scale posture: the FILE is the parallelism unit — the `binaryFile`
  * source distributes the listing and ships each segment's bytes straight
  * to one task; records stream out of a per-file iterator (no
  * whole-file record list is ever materialized) and payload bytes never
  * visit the driver. Gzip members are not offset-splittable, which is
  * exactly why crawl archives ship as many ~1 GB segments — at 100 TB
  * that is ~100k files, far above any realistic executor count, so
  * per-file granularity saturates the cluster. Corrupt regions degrade
  * to `error` rows with resynchronization to the next record marker
  * (the A19 isolation posture): at crawl scale some fraction of any
  * archive IS damaged, and one bad record must cost bytes, not the job.
  */
object Warc {

  private val Crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Lets a per-record GZIPOutputStream be close()d (releasing its native
    * Deflater) without closing the shared shard file stream. */
  private final class CloseShield(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def close(): Unit = flush()
  }
  private val VersionPrefix = "WARC/1.".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // ---------------------------------------------------------------- writer

  /** Serialize one record. The parser must invert this exactly. */
  def writeRecord(out: java.io.OutputStream, warcType: String, recordId: String,
      targetUri: String, warcDate: String, contentType: String,
      payload: Array[Byte], versionLine: String = "WARC/1.0"): Unit = {
    val h = new StringBuilder
    h.append(versionLine).append("\r\n")
    h.append("WARC-Type: ").append(warcType).append("\r\n")
    h.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    h.append("WARC-Date: ").append(warcDate).append("\r\n")
    if (targetUri != null) h.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    h.append("Content-Type: ").append(contentType).append("\r\n")
    h.append("Content-Length: ").append(payload.length).append("\r\n")
    h.append("\r\n")
    out.write(h.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
  }

  // ---------------------------------------------------------------- parser

  /** Result of a gzip inflate: the bytes that decompressed cleanly, plus
    * how many compressed TAIL bytes were abandoned mid-stream (0 = clean).
    * JDK GZIPInputStream cannot report the latter — it swallows a
    * malformed next-member header as end-of-stream, silently dropping
    * every later member — so the member loop is hand-rolled on Inflater
    * (RFC 1952 header/trailer parse + RFC 1951 raw deflate). */
  final case class Inflated(bytes: Array[Byte], corruptTailBytes: Long)

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Multi-member gzip inflate (magic 1f 8b) — pass-through otherwise.
    * Each member is inflated independently; the first malformed member
    * ends the walk and reports the remaining compressed bytes as corrupt
    * instead of silently truncating (data loss) or throwing (job loss). */
  def inflateIfGzip(raw: Array[Byte]): Inflated = {
    if (!isGzip(raw)) return Inflated(raw, 0L)
    // initial-capacity hint only (BAOS grows): long math so a multi-GB
    // segment can't overflow Int and throw before inflation even starts
    val out = new java.io.ByteArrayOutputStream(
      math.min(raw.length.toLong * 4, 1L << 26).toInt)
    var pos = 0
    while (pos < raw.length) {
      val member = new java.io.ByteArrayOutputStream(64 * 1024)
      parseMember(raw, pos, member) match {
        // a malformed member's PARTIAL inflate is discarded with it —
        // only whole verified members join the clean prefix
        case -1 => return Inflated(out.toByteArray, (raw.length - pos).toLong)
        case next => member.writeTo(out); pos = next
      }
    }
    Inflated(out.toByteArray, 0L)
  }

  /** Inflate ONE gzip member starting at `pos`, appending to `out`.
    * Returns the offset just past the member's trailer, or -1 when the
    * member is malformed (header, deflate stream, CRC, or length). */
  private def parseMember(raw: Array[Byte], pos: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var p = pos
    def u8(i: Int): Int = raw(i) & 0xff
    // RFC 1952 fixed header: magic, CM=8 (deflate), FLG, 4B MTIME, XFL, OS
    if (p + 10 > raw.length || u8(p) != 0x1f || u8(p + 1) != 0x8b || u8(p + 2) != 8)
      return -1
    val flg = u8(p + 3)
    p += 10
    if ((flg & 0x04) != 0) { // FEXTRA: 2B little-endian length + payload
      if (p + 2 > raw.length) return -1
      p += 2 + u8(p) + (u8(p + 1) << 8)
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (p < raw.length && raw(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
      while (p < raw.length && raw(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p > raw.length) return -1
    val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
    try {
      inf.setInput(raw, p, raw.length - p)
      val crc = new java.util.zip.CRC32()
      val buf = new Array[Byte](64 * 1024)
      var isize = 0L
      while (!inf.finished()) {
        val n = try inf.inflate(buf) catch {
          case _: java.util.zip.DataFormatException => return -1
        }
        if (n == 0 && !inf.finished()) return -1 // needs input past EOF
        out.write(buf, 0, n); crc.update(buf, 0, n); isize += n
      }
      val trailer = p + inf.getBytesRead.toInt
      if (trailer + 8 > raw.length) return -1
      def le32(i: Int): Long =
        (u8(i).toLong) | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
          (u8(i + 3).toLong << 24)
      if (le32(trailer) != crc.getValue || le32(trailer + 4) != (isize & 0xffffffffL))
        return -1
      trailer + 8
    } finally inf.end()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Next plausible record start at/after `from`: "WARC/1." at offset 0
    * or preceded by a LF (payload bytes could contain the string mid-line;
    * real readers accept that residual ambiguity). */
  private def nextRecordStart(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = indexOf(bytes, VersionPrefix, i)
      if (i < 0) return -1
      if (i == 0 || bytes(i - 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** The framing walk shared by the whole-file parse and the byte-range
    * split parse: records whose START offset lies in [startPos,
    * stopBefore) — a record may EXTEND past stopBefore (split overshoot
    * semantics, the classic input-split rule). `atEof` distinguishes a
    * record cut off by the file (`truncated`) from one cut off by the
    * split buffer (`record-too-large` — it exceeds the overshoot the
    * split reader budgeted). */
  private def recordIterator(path: String, bytes: Array[Byte], startPos: Int,
      stopBefore: Int, atEof: Boolean,
      counter: java.util.concurrent.atomic.AtomicInteger): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = startPos
      private def idx = counter.get()
      private def idxInc(): Unit = counter.incrementAndGet()
      private def done: Boolean = {
        // trailing CRLF padding between/after records is frame, not data
        while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        pos >= bytes.length || pos >= stopBefore
      }
      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        val start = pos
        def fail(err: String): WarcRecord = {
          val resync = nextRecordStart(bytes, start + 1)
          pos = if (resync < 0) bytes.length else resync
          val r = WarcRecord(path, idx, null, null, null, null, null, -1L,
            null, err, (pos - start).toLong)
          idxInc(); r
        }
        // qualified: the anonymous Iterator inherits its own `indexOf`
        val headEnd = Warc.indexOf(bytes, "\r\n\r\n".getBytes, start)
        if (headEnd < 0) return fail(if (atEof) "no-header-terminator"
          else "record-too-large")
        val head = new String(bytes, start, headEnd - start,
          java.nio.charset.StandardCharsets.US_ASCII)
        val lines = head.split("\r\n")
        if (!(lines(0) == "WARC/1.0" || lines(0) == "WARC/1.1"))
          return fail("bad-version")
        // header names are case-insensitive (ISO 28500 §4); first wins
        val hdrs = scala.collection.mutable.Map.empty[String, String]
        var malformed: String = null
        lines.iterator.drop(1).foreach { ln =>
          val c = ln.indexOf(':')
          if (c <= 0) { if (malformed == null) malformed = "bad-header-line" }
          else {
            val k = ln.substring(0, c).trim.toLowerCase
            if (!hdrs.contains(k)) hdrs(k) = ln.substring(c + 1).trim
          }
        }
        if (malformed != null) return fail(malformed)
        val clen = hdrs.get("content-length").flatMap(s => s.toLongOption)
          .getOrElse(-1L)
        if (clen < 0) return fail("bad-content-length")
        val bodyStart = headEnd + 4
        if (bodyStart + clen > bytes.length)
          return fail(if (atEof) "truncated" else "record-too-large")
        val payload = java.util.Arrays.copyOfRange(bytes, bodyStart,
          bodyStart + clen.toInt)
        pos = bodyStart + clen.toInt
        val r = WarcRecord(path, idx,
          hdrs.getOrElse("warc-type", null),
          hdrs.getOrElse("warc-record-id", null),
          hdrs.getOrElse("warc-target-uri", null),
          hdrs.getOrElse("warc-date", null),
          hdrs.getOrElse("content-type", null),
          clen, payload, null, 0L)
        idxInc(); r
      }
    }

  /** Stream the records of one (possibly gzipped) WARC file. Corrupt
    * regions produce one error row each and parsing resumes at the next
    * record marker; a gzip member that fails mid-segment costs the
    * compressed tail (one error row), never the members before it; the
    * iterator never throws on malformed input. */
  def parseAll(path: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val inflated = inflateIfGzip(raw)
    val bytes = inflated.bytes
    if (bytes.isEmpty && inflated.corruptTailBytes > 0)
      return Iterator.single(WarcRecord(path, 0, null, null, null, null,
        null, -1L, null, "bad-gzip", inflated.corruptTailBytes))
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val main = recordIterator(path, bytes, 0, bytes.length, atEof = true, counter)
    // the corrupt compressed tail (if any) surfaces as one final error
    // row; `counter` is read only after `main` is exhausted
    val tail =
      if (inflated.corruptTailBytes > 0)
        Iterator.single(()).map(_ => WarcRecord(path, counter.get(), null,
          null, null, null, null, -1L, null, "bad-gzip-member",
          inflated.corruptTailBytes))
      else Iterator.empty
    main ++ tail
  }

  /** Parse the records of ONE byte-range split of a PLAIN (uncompressed)
    * WARC file — the pure kernel behind [[scanSplits]], exposed for
    * property-testing split invariance without a cluster.
    *
    * `buf` holds file bytes [bufStart, bufStart + buf.length); the split
    * owns records whose start offset ∈ [rangeStart, rangeEnd). The first
    * split (rangeStart == 0) starts at offset 0; later splits resync to
    * the first record marker at/after rangeStart (the partial record
    * crossing the boundary belongs to the PREVIOUS split, which parses
    * past its rangeEnd to finish it — so the union over splits is exactly
    * the whole-file record set, each record once). `rec_idx` is the
    * ordinal WITHIN the split. */
  def parseRange(path: String, buf: Array[Byte], bufStart: Long,
      rangeStart: Long, rangeEnd: Long, fileLen: Long): Iterator[WarcRecord] = {
    val searchFrom = (rangeStart - bufStart).toInt
    val startPos =
      if (rangeStart == 0L) 0
      else nextRecordStart(buf, searchFrom) // buf includes rangeStart-1, so
    // a marker exactly at the boundary still sees its preceding LF
    val stopBefore = (rangeEnd - bufStart).toInt
    if (startPos < 0 || startPos >= stopBefore) return Iterator.empty
    val atEof = bufStart + buf.length >= fileLen
    recordIterator(path, buf, startPos, stopBefore, atEof,
      new java.util.concurrent.atomic.AtomicInteger(0))
  }

  // ---------------------------------------------------------------- source

  /** Batch scan: every record of every WARC segment under `dir`.
    * Listing is distributed by the binaryFile source; each file parses
    * in the task that holds its bytes. */
  def scan(spark: SparkSession, dir: String, glob: String = "*.warc*"): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseAll(p, bytes) }
  }

  /** Offset-splittable scan for PLAIN WARC: one task per byte range, the
    * scalable read path when archives ship as few HUGE uncompressed
    * files (gzip members are not seekable, so `.gz` segments fall back
    * to one whole-file split each). Each split reads only
    * [rangeStart − 1, rangeEnd + maxRecordBytes) — split size + overshoot
    * of executor memory, never the file — resyncs to the first record
    * marker in its range, and parses records STARTING in the range,
    * running past its end to finish the last one (the input-split rule:
    * every VALID record parses exactly once, property-pinned by
    * WarcSpec). Corruption accounting is best-effort under splitting —
    * a corrupt region surfaces as an error row only when the split that
    * reaches it sequentially still owns it; a region whose start falls
    * just past a boundary has no recognizable marker for the next split
    * to claim, so its bytes skip silently (the inherent limit of marker
    * resync; every Hadoop-style WARC splitter shares it). Whole-file
    * [[scan]] is authoritative for corruption forensics. A record longer
    * than `maxRecordBytes` surfaces as a `record-too-large` error row
    * rather than unbounded task memory. */
  def scanSplits(spark: SparkSession, dir: String, glob: String = "*.warc*",
      splitBytes: Long = 128L << 20, maxRecordBytes: Int = 16 << 20): Dataset[WarcRecord] = {
    import spark.implicits._
    require(splitBytes > 0 && maxRecordBytes > 0 &&
      splitBytes + maxRecordBytes + 1 <= Int.MaxValue,
      "split + overshoot must fit one JVM byte array")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val splits: Seq[(String, Long, Long, Long)] =
      fs.globStatus(new org.apache.hadoop.fs.Path(p, glob)).toSeq.flatMap { st =>
        val path = st.getPath.toString
        val len = st.getLen
        if (path.endsWith(".gz") || len <= splitBytes)
          Seq((path, 0L, len, len)) // unsplittable / small: one split
        else (0L until len by splitBytes).map(s =>
          (path, s, math.min(s + splitBytes, len), len))
      }
    val maxRec = maxRecordBytes.toLong
    spark.createDataset(splits)
      .repartition(math.max(splits.size, 1)) // one task per split
      .flatMap { case (path, rangeStart, rangeEnd, fileLen) =>
        val hp = new org.apache.hadoop.fs.Path(path)
        // fresh Configuration: Hadoop confs are not serializable and the
        // default resolves file:// and any fs.defaultFS-configured store
        val tfs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val bufStart = math.max(0L, rangeStart - 1)
        val bufEnd = math.min(fileLen, rangeEnd + maxRec)
        val buf = new Array[Byte]((bufEnd - bufStart).toInt)
        val in = tfs.open(hp)
        try { in.seek(bufStart); in.readFully(buf) } finally in.close()
        if (rangeStart == 0L && isGzip(buf)) parseAll(path, buf)
        else parseRange(path, buf, bufStart, rangeStart, rangeEnd, fileLen)
      }
  }

  /** Streaming scan — newly-landed crawl segments per micro-batch (the
    * A4 scheduled re-walk shape, same parser). */
  def scanStream(spark: SparkSession, dir: String, glob: String = "*.warc*"): Dataset[WarcRecord] = {
    import spark.implicits._
    val schema = spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(dir).schema
    spark.readStream.format("binaryFile").option("pathGlobFilter", glob)
      .schema(schema).load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseAll(p, bytes) }
  }

  // --------------------------------------------------------------- fixture

  /** Deterministic WARC corpus for the ingest query/specs: documents with
    * doc_id % 7 == 0, sharded into 8 segments by (doc_id/7) % 8 — even
    * shards plain `.warc`, odd shards per-record-gzip-member `.warc.gz`.
    * Every doc_id % 70 == 0 record is written with a corrupt version line
    * ("WARC/9.9") so the query exercises resync isolation. Each shard is
    * written by the one task that owns its records (B11 posture);
    * idempotent via marker. */
  def ensureFixture(spark: SparkSession, sfDir: String): String = {
    val name = new java.io.File(sfDir).getName
    val out = java.nio.file.Paths.get(s"/tmp/graft_warc_fixture/$name")
    val marker = out.resolve("_COMPLETE")
    if (!java.nio.file.Files.exists(marker)) {
      java.nio.file.Files.createDirectories(out)
      val outStr = out.toString
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"),
          ((col("doc_id") / 7).cast("long") % 8).as("shard"))
        .repartition(8, col("shard"))
        // hash-partitioning can co-locate two shards in one task, so sort
        // by (shard, id) and STREAM rows, switching files on shard change
        // — a partition is never materialized (segments outgrow memory
        // long before they outgrow disk)
        .sortWithinPartitions(col("shard"), col("doc_id"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          var shard = -1L
          var fos: java.io.BufferedOutputStream = null
          try {
            rows.foreach { r =>
              if (r.getLong(2) != shard) {
                if (fos != null) fos.close()
                shard = r.getLong(2)
                val gz = shard % 2 == 1
                fos = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                  new java.io.File(outStr,
                    if (gz) s"segment-$shard.warc.gz" else s"segment-$shard.warc")))
              }
              val id = r.getLong(0)
              val payload = r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              val target: java.io.OutputStream =
                if (shard % 2 == 1)
                  new java.util.zip.GZIPOutputStream(new CloseShield(fos))
                else fos
              writeRecord(target, "response",
                s"<urn:graft:$id>", s"http://graft.test/doc/$id",
                f"2026-01-${id % 28 + 1}%02dT00:00:00Z",
                "text/plain; charset=utf-8", payload,
                versionLine = if (id % 70 == 0) "WARC/9.9" else "WARC/1.0")
              target match {
                case g: java.util.zip.GZIPOutputStream => g.close()
                case _ =>
              }
            }
          } finally if (fos != null) fos.close()
        }
      java.nio.file.Files.write(marker, Array.emptyByteArray)
    }
    out.toString
  }
}
