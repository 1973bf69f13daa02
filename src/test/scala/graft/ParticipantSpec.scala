package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.ops.{ChunkAlgebra, ChunkCommand, ChunkCommandOp}
import graft.pipeline.Renditions
import graft.sources.DirectoryIngest
import graft.streaming.Streaming

/** Participant-pattern operators: directory ingestion (batch + streaming
  * re-walk), the chunk-command log fold, rendition extraction, sentence
  * framing, and the keyed wire-format sink round-trip. */
class ParticipantSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def writeTxt(dir: java.nio.file.Path, name: String, content: String): Unit =
    java.nio.file.Files.write(dir.resolve(name),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("directory ingest: scan → events → fold round-trips files (B9)") {
    val dir = tmpDir("ingest_batch")
    writeTxt(dir, "7.txt", "seven words of plain text here now")
    writeTxt(dir, "42.txt", "answer")
    val recs = graft.pipeline.Consolidate.batch(
      DirectoryIngest.asEvents(DirectoryIngest.scan(spark, dir.toString))).collect()
    assert(recs.map(_.id).toSet == Set(7L, 42L))
    assert(recs.map(_.name).toSet == Set("7.txt", "42.txt"))
    // representation resolves through the file-backed content provider
    val content = recs.sortBy(_.id).map(r =>
      graft.pipeline.FileContentResolver.resolve(r.representation).orNull)
    assert(content.toSeq == Seq("seven words of plain text here now", "answer"))
  }

  test("directory ingest: 'a1.txt' does not collide with '1.txt' on id 1") {
    val dir = tmpDir("ingest_collide")
    writeTxt(dir, "1.txt", "pure numeric stem")
    writeTxt(dir, "a1.txt", "alphanumeric stem must hash, not parse as 1")
    val recs = graft.pipeline.Consolidate.batch(
      DirectoryIngest.asEvents(DirectoryIngest.scan(spark, dir.toString))).collect()
    assert(recs.length == 2, s"collided: ${recs.toSeq}")
    assert(recs.map(_.id).contains(1L))
    assert(recs.map(_.name).toSet == Set("1.txt", "a1.txt"))
  }

  test("directory ingest: streaming scan picks up files appearing later (A4)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("ingest_stream")
    writeTxt(dir, "1.txt", "first file")
    val q = DirectoryIngest.asEvents(DirectoryIngest.scanStream(spark, dir.toString))
      .writeStream.format("memory").queryName("ingest_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      writeTxt(dir, "2.txt", "second file later") // the re-walk analog
      q.processAllAvailable()
      val names = spark.sql("select name from ingest_stream_test")
        .as[String].collect().toSet
      assert(names == Set("1.txt", "2.txt"))
    } finally q.stop()
  }

  test("chunk-command fold: order independence and OOB no-ops (D)") {
    val log = Seq(
      ChunkCommand(1L, 1L, 0L, ChunkCommandOp.Start, 0, 0, null),
      ChunkCommand(1L, 2L, 0L, ChunkCommandOp.Add, 0, 0, "a"),
      ChunkCommand(1L, 2L, 1L, ChunkCommandOp.Add, 0, 0, "b"),
      ChunkCommand(1L, 3L, 0L, ChunkCommandOp.Insert, 1, 0, "c"),   // [a,c,b]
      ChunkCommand(1L, 4L, 0L, ChunkCommandOp.Update, 5, 0, "zz"),  // OOB noop
      ChunkCommand(1L, 5L, 0L, ChunkCommandOp.Delete, 9, 0, null),  // OOB noop
      ChunkCommand(1L, 6L, 0L, ChunkCommandOp.Merge, 0, 1, null),   // ["a c", b]
      ChunkCommand(1L, 7L, 0L, ChunkCommandOp.Insert, 2, 0, "d"))   // append at end
    // shuffle the log — (ts, seq) must restore the order inside the fold
    val shuffled = scala.util.Random.shuffle(log)
    val out = ChunkAlgebra.foldCommandLog(spark.createDataset(shuffled))
      .as[(Long, Seq[String])].collect()
    assert(out.toSeq == Seq((1L, Seq("a c", "b", "d"))))
  }

  test("sentence chunker: framing markers and period restoration (B5)") {
    val df = Seq(
      (1L, "one two. three four. five six."),
      (2L, "only sentence.")).toDF("id", "text")
    val out = ChunkAlgebra.sentenceChunks(df, "id", "text")
      .orderBy($"id", $"idx")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, "START", "one two."),
      (1L, 1L, "MID", "three four."),
      (1L, 2L, "LAST", "five six."),
      (2L, 0L, "ONLY", "only sentence.")))
  }

  test("rendition extraction strips markup and decodes entities (B3)") {
    val df = Seq((1L, "<html><body><p>a &amp; b &lt;ok&gt;</p></body></html>"))
      .toDF("id", "html")
    val out = df.select(Renditions.stripMarkup($"html")).as[String].head()
    assert(out == "a & b <ok>")
  }

  test("wire format round-trips events exactly (A5/A6 layout)") {
    val evs = Seq(
      DataRecordEvent.create(3L, "doc-3", DocumentRepresentation("x y z", "inline"), 1L, 0L),
      DataRecordEvent.upsertMeta(3L, Metadata(Map("k" -> "v", "k2" -> "v2"), "m"), 2L, 1L),
      DataRecordEvent.upsertRepresentation(3L, DocumentRepresentation("/p/3.txt", "tika"), 3L, 0L))
    val wire = Streaming.toWire(spark.createDataset(evs))
    assert(wire.columns.toSeq == Seq("key", "value")) // the keyed layout
    assert(wire.select($"key").as[String].collect().forall(_ == "3"))
    val back = Streaming.fromWire(wire).collect().toSet
    assert(back == evs.toSet)
  }

  test("connected components labels transitive dup clusters with the min id") {
    val pairs = Seq(
      (10L, 2L), (2L, 30L),   // chain: {2, 10, 30} → cluster 2
      (7L, 40L),              // pair: {7, 40} → cluster 7
      (100L, 5L), (5L, 100L)) // duplicate edge must not matter
      .toDF("id_a", "id_b")
    val got = graft.ops.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 10L -> 2L, 30L -> 2L,
      7L -> 7L, 40L -> 7L, 5L -> 5L, 100L -> 5L))
  }

  test("connected components handles a chain far deeper than the round budget") {
    // a 200-link chain needs 199 rounds of plain label propagation;
    // large-star/small-star must collapse it in O(log n) alternations
    val n = 200
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = graft.ops.Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 0L))
  }

  test("connected components agrees with union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(e => e._1 != e._2)
    // union-by-min oracle: the surviving root is always the component min
    val parent = Array.tabulate(150)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    val got = graft.ops.Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("connected components is concurrency-safe: no session-conf bleed into parallel queries") {
    // GraftService runs queries concurrently on ONE session. The CC loop
    // wants AQE off and pinned shuffle partitions — round 13 set those on
    // the shared session conf (restored in finally), which raced with any
    // concurrent query on the same session; the loop now runs on an
    // isolated newSession(). This pins the fix: CC and an
    // aggregate-with-AQE query run concurrently, values must be exact and
    // the shared session's confs untouched throughout.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val pairs = (0 until 120).map(i => (i.toLong, ((i + 1) % 60).toLong))
      .filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val confSamples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ccF = Future {
      graft.ops.Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    }
    val otherF = Future {
      (1 to 8).map { _ =>
        confSamples.add(spark.conf.get("spark.sql.adaptive.enabled") + "/" +
          spark.conf.get("spark.sql.shuffle.partitions"))
        spark.range(100000).selectExpr("sum(id)").head().getLong(0)
      }
    }
    val cc = Await.result(ccF, 120.seconds)
    val sums = Await.result(otherF, 120.seconds)
    assert(sums.forall(_ == 4999950000L))
    // the 60-cycle plus tails {60..119} all connect into component 0
    assert(cc.values.toSet == Set(0L), s"labels diverged: ${cc.values.toSet}")
    assert(cc.size == 120)
    // the shared session's confs were never mutated, not even transiently
    confSamples.forEach(s => assert(s == s"$aqeBefore/$partsBefore", s"conf bled: $s"))
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
  }

  test("parse enricher mirrors the columnar parse-map rows (B6)") {
    import graft.functions.TextFunctions
    val text = "the cat runs quickly to 42 red9 flying jumped trees x"
    val enricher = new graft.pipeline.StandardEnrichers.ParseEnricher()
    val rec = DataRecord(1L, "d", 1L, DocumentRepresentation(text, "inline"), Seq.empty, Seq.empty)
    val fromEnricher = enricher.values(rec)
    val words = text.split(" ", -1)
    // spot-check the rule order and framing against the columnar tagger
    val columnar = Seq(words: _*).toDF("w")
      .select(TextFunctions.posTag($"w"), TextFunctions.neTag($"w"))
      .as[(String, String)].collect()
    words.zipWithIndex.foreach { case (w, idx) =>
      val (i, j) = (idx / 7, idx % 7)
      assert(fromEnricher(s"word_${i}_$j") == w)
      assert(fromEnricher(s"pos_${i}_$j") == columnar(idx)._1)
      assert(fromEnricher(s"ne_${i}_$j") == columnar(idx)._2)
    }
    assert(fromEnricher("sentence_0") == words.take(7).mkString(" "))
    assert(fromEnricher("sentence_1") == words.drop(7).mkString(" "))
    assert(fromEnricher("pos_0_0") == "DT" && fromEnricher("pos_0_5") == "CD")
    assert(fromEnricher("ne_0_5") == "NUMBER" && fromEnricher("ne_0_6") == "IDENT")
  }

  test("keyed sink writes the wire layout a fromWire source replays (A5/A6)") {
    implicit val sqlCtx = spark.sqlContext
    val topic = tmpDir("topic_dir").toString
    val input = MemoryStream[DataRecordEvent]
    val evs = (1L to 4L).map(id =>
      DataRecordEvent.create(id, s"doc-$id", DocumentRepresentation(s"t $id", "inline"), 1L, 0L))
    input.addData(evs)
    val q = Streaming.keyedSink(input.toDS(), topic)
    try q.processAllAvailable() finally q.stop()
    val replayed = Streaming.fromWire(spark.read.parquet(topic)).collect().toSet
    assert(replayed == evs.toSet)
  }

  test("GRFT parse detects EVERY single-byte corruption (fuzz over all positions)") {
    // the format's integrity claim, exhaustively: magic/version flips hit
    // their checks, length-field flips hit bad-length, payload flips hit
    // the CRC (CRC32 detects all single-byte substitutions), CRC-field
    // flips mismatch the recomputed value — no corrupted position may
    // parse clean, and none may crash the parse either
    val bytes = graft.pipeline.BinaryDocs.encode("hello world sample text for fuzzing")
    val rows = bytes.indices.map { i =>
      val b = bytes.clone(); b(i) = (b(i) ^ 0x5A).toByte; (i.toLong, b)
    }.toDF("pos", "content")
    val clean = graft.pipeline.BinaryDocs.parsed(rows)
      .filter(col("parse_error").isNull).select($"pos").as[Long].collect()
    assert(clean.isEmpty, s"corrupted positions parsed clean: ${clean.toSeq}")
  }

  test("GRFT parse rejects ALL 255 wrong values at every header/trailer byte (value-exhaustive)") {
    // the single-XOR fuzz above covers every position with ONE wrong
    // value; the structured bytes (9 header + 4 CRC trailer) get every
    // possible wrong value here. This includes setting the high
    // payload-length byte to 0xFF — a declared length ≥ 0x80000000 whose
    // int cast would overflow under ANSI if the bad-length branch did not
    // fire first, pinning the CaseWhen ordering in BinaryDocs.parsed.
    import graft.pipeline.BinaryDocs
    val bytes = BinaryDocs.encode("hello world sample text for fuzzing")
    val positions = (0 until BinaryDocs.HeaderLen) ++
      ((bytes.length - BinaryDocs.TrailerLen) until bytes.length)
    val rows = positions.flatMap { i =>
      (1 to 255).map { v =>
        val b = bytes.clone(); b(i) = (b(i) ^ v).toByte
        (i.toLong * 1000 + v, b)
      }
    }.toDF("pos", "content")
    val clean = BinaryDocs.parsed(rows)
      .filter(col("parse_error").isNull).select($"pos").as[Long].collect()
    assert(clean.isEmpty,
      s"corrupted (pos*1000+xor) parsed clean: ${clean.toSeq.take(10)}")
  }

  test("dangling content pointer isolates as missing-content, siblings unaffected (A19)") {
    // the crawl-then-read race at 100 TB: a record whose representation
    // path no longer resolves must register !error = missing-content and
    // must not drop or fail the batch
    val recs = Seq(
      DataRecord(1L, "a.bin", 1L, DocumentRepresentation("/p/a.bin", "directory"),
        Seq.empty, Seq.empty),
      DataRecord(2L, "gone.bin", 1L, DocumentRepresentation("/p/gone.bin", "directory"),
        Seq.empty, Seq.empty)).toDS()
    val contentByPath = Seq(("/p/a.bin", graft.pipeline.BinaryDocs.encode("alive")))
      .toDF("path", "content")
    val evs = graft.pipeline.BinaryDocs.parseEvents(recs, contentByPath).collect()
    val errs = evs.filter(e => e.command == Command.UpsertMetadata)
      .map(e => e.id -> e.meta.get.values.get("!error")).toMap
    assert(errs(2L).contains("missing-content"), s"dangling pointer: $errs")
    assert(errs(1L).isEmpty, s"healthy sibling got an error: $errs")
    assert(evs.exists(e => e.command == Command.UpsertRepresentation && e.id == 1L &&
      e.representation.get.path == "alive"), "healthy sibling lost its rendition")
    assert(!evs.exists(e => e.command == Command.UpsertRepresentation && e.id == 2L),
      "dangling pointer must not produce a rendition")
  }

  test("ZIP container: docx-shaped round-trip, XML escaping, entry walk (B2/B3 real format)") {
    import graft.pipeline.ZipDocs
    val text = "plain words & <tags> survive the w:t run \"quoted\" 'too'"
    val (err, extracted, n) = ZipDocs.parseZip(ZipDocs.encode(text))
    assert(err == null && extracted == text && n == 3L,
      s"round-trip: err=$err n=$n text=$extracted")
    // archive size is closed-form: STORED entries, no compressor variance
    assert(ZipDocs.encode(text).length ==
      ZipDocs.fixedOverheadBytes + ZipDocs.escapeXml(text)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
  }

  test("ZIP container: corrupt, non-zip, and main-part-less archives isolate per record") {
    import graft.pipeline.ZipDocs
    // payload corruption → the stored entry's CRC check fires
    val corrupt = ZipDocs.encode("some document text")
    val marker = "<w:t>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val at = corrupt.indices.find(i => i + marker.length < corrupt.length &&
      java.util.Arrays.equals(corrupt, i, i + marker.length, marker, 0, marker.length)).get +
      marker.length
    corrupt(at) = (corrupt(at) ^ 0x5A).toByte
    assert(ZipDocs.parseZip(corrupt)._1 == "bad-zip", "CRC-corrupt archive must be bad-zip")
    // not a zip at all
    assert(ZipDocs.parseZip("just text".getBytes)._1 == "bad-zip")
    // truncated mid-entry
    val truncated = ZipDocs.encode("some document text").take(40)
    assert(ZipDocs.parseZip(truncated)._1 == "bad-zip")
    // a VALID zip without word/document.xml
    val baos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(baos)
    zos.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zos.write("hi".getBytes); zos.closeEntry(); zos.close()
    assert(ZipDocs.parseZip(baos.toByteArray)._1 == "missing-entry")
  }

  test("ZIP container: DEFLATED entries parse too (real docx compresses)") {
    // the fixture writer stays STORED for byte determinism, but real
    // .docx files DEFLATE their parts — the parser must handle both
    import graft.pipeline.ZipDocs
    val text = "deflated words here compress fine"
    val baos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(baos) // DEFLATED by default
    def put(name: String, payload: Array[Byte]): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(payload); zos.closeEntry()
    }
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    put("[Content_Types].xml", "<Types/>".getBytes(utf8))
    put(ZipDocs.DocumentEntry,
      ("<w:document><w:body><w:p><w:r><w:t>" + ZipDocs.escapeXml(text) +
        "</w:t></w:r></w:p></w:body></w:document>").getBytes(utf8))
    zos.close()
    val (err, extracted, n) = ZipDocs.parseZip(baos.toByteArray)
    assert(err == null && extracted == text && n == 2L,
      s"deflated round-trip: err=$err n=$n text=$extracted")
  }

  test("ZIP container: mime detection + columnar EOCD entry count") {
    val zip = graft.pipeline.ZipDocs.encode("detect me")
    val rows = Seq((1L, zip), (2L, "not a zip".getBytes)).toDF("media_id", "content")
    val out = graft.multimodal.MimeDetect.detected(rows).orderBy($"media_id")
      .select($"mime", $"zip_entries").collect()
    assert(out(0).getString(0) == "application/zip" && out(0).getLong(1) == 3L,
      s"zip row: ${out(0)}")
    assert(out(1).getString(0) == "text/plain" && out(1).isNullAt(1), s"text row: ${out(1)}")
  }

  test("PDF: round-trip plain AND flate, string escaping, closed-form size") {
    import graft.pipeline.PdfDocs
    val text = "parens (both kinds) and a back\\slash plus\ttab survive"
    for (flate <- Seq(false, true)) {
      val (err, extracted, n, f) = PdfDocs.parsePdf(PdfDocs.encode(text, flate))
      assert(err == null && extracted == text && n == 1L &&
        f == (if (flate) "flate" else "none"),
        s"round-trip flate=$flate: err=$err n=$n f=$f text=$extracted")
    }
    // uncompressed layout is fixed-width everywhere → size is closed-form
    val plain = "no escapes here just words"
    assert(PdfDocs.encode(plain).length == PdfDocs.fixedOverheadBytes + plain.length,
      "plain-form size must be overhead + text length")
    // the flate form must actually be zlib: inflating the raw stream works
    val enc = PdfDocs.encode("compress me " * 20, flate = true)
    assert(enc.length < PdfDocs.fixedOverheadBytes + 240,
      "repetitive text must actually compress")
  }

  test("PDF: corrupt, truncated, non-pdf, and text-free documents isolate per record") {
    import graft.pipeline.PdfDocs
    // broken header magic (the fixture's corruption plant)
    val broken = PdfDocs.encode("some text")
    broken(1) = (broken(1) ^ 0x5A).toByte
    assert(PdfDocs.parsePdf(broken)._1 == "bad-pdf", "broken magic must be bad-pdf")
    // truncated mid-stream (loses endstream and %%EOF)
    val truncated = PdfDocs.encode("some text").take(120)
    assert(PdfDocs.parsePdf(truncated)._1 == "bad-pdf", "truncated must be bad-pdf")
    // corrupted flate bytes: structure intact, inflate must throw → bad-pdf
    val flate = PdfDocs.encode("compressed text here", flate = true)
    val streamAt = new String(flate, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("stream\n") + "stream\n".length
    flate(streamAt + 4) = (flate(streamAt + 4) ^ 0xFF).toByte
    assert(PdfDocs.parsePdf(flate)._1 == "bad-pdf", "corrupt flate data must be bad-pdf")
    // not a pdf at all
    assert(PdfDocs.parsePdf("just text".getBytes)._1 == "bad-pdf")
    // structurally valid but no Tj operator
    val noText = PdfDocs.encode("x")
    val s = new String(noText, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("(x) Tj", "      ")
    assert(PdfDocs.parsePdf(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))._1 == "no-text")
  }

  test("PDF: octal and letter escapes unescape per spec") {
    import graft.pipeline.PdfDocs
    assert(PdfDocs.unescapeString("\\101\\102c") == "ABc", "octal escapes")
    assert(PdfDocs.unescapeString("a\\(b\\)c\\\\d") == "a(b)c\\d", "delimiter escapes")
    assert(PdfDocs.unescapeString("\\q") == "q", "unknown escape is the char itself")
  }

  test("PDF: every single-byte corruption classifies, never throws (fuzz over all positions)") {
    // PDF has NO payload checksum, so — unlike GRFT's CRC — a flip inside
    // the text region of a plain document legitimately parses with
    // different text. The contract fuzzed here is the A19 one: for EVERY
    // corrupted position, in both the plain and the flate form, parsePdf
    // must return a classification (ok / bad-pdf / no-text), never raise
    // — one malformed crawl file must never fail the job. The flate form
    // adds the zlib Adler-32: flips landing in the compressed data must
    // surface as bad-pdf, not as silently different text.
    import graft.pipeline.PdfDocs
    for (flate <- Seq(false, true)) {
      val bytes = PdfDocs.encode("hello world sample text for fuzzing", flate)
      val outcomes = bytes.indices.map { i =>
        val b = bytes.clone(); b(i) = (b(i) ^ 0x5A).toByte
        val (err, text, _, _) = PdfDocs.parsePdf(b) // throws => test fails
        (i, err, text)
      }
      // valid outcomes are exactly (ok: text, no error) or (error, no text)
      val bad = outcomes.filter { case (_, err, text) => (err == null) == (text == null) }
      assert(bad.isEmpty, s"unclassified outcomes (flate=$flate): ${bad.take(5)}")
      if (flate) {
        // locate the deflate payload and require every flip inside it to
        // be caught by the zlib integrity check
        val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        val dataStart = s.indexOf("stream\n") + "stream\n".length
        val dataEnd = s.indexOf("\nendstream")
        val silent = outcomes.collect {
          case (i, err, _) if i >= dataStart && i < dataEnd && err == null => i
        }
        assert(silent.isEmpty, s"flate flips parsed clean at: ${silent.take(10)}")
      }
    }
  }

  test("PDF: all 255 wrong values at every magic/trailer byte are bad-pdf (value-exhaustive)") {
    import graft.pipeline.PdfDocs
    val bytes = PdfDocs.encode("hello world sample text for fuzzing")
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val eofAt = s.lastIndexOf("%%EOF")
    val positions = (0 until 5) ++ (eofAt until eofAt + 5)
    val clean = positions.flatMap { i =>
      (1 to 255).flatMap { v =>
        val b = bytes.clone(); b(i) = (b(i) ^ v).toByte
        if (PdfDocs.parsePdf(b)._1 != "bad-pdf") Some((i, v)) else None
      }
    }
    assert(clean.isEmpty, s"corrupted (pos,xor) not bad-pdf: ${clean.take(10)}")
  }

  test("PDF: mime detection + columnar version parse") {
    val pdf = graft.pipeline.PdfDocs.encode("detect me")
    val rows = Seq((1L, pdf), (2L, "not a pdf".getBytes)).toDF("media_id", "content")
    val out = graft.multimodal.MimeDetect.detected(rows).orderBy($"media_id")
      .select($"mime", $"pdf_version").collect()
    assert(out(0).getString(0) == "application/pdf" && out(0).getString(1) == "1.4",
      s"pdf row: ${out(0)}")
    assert(out(1).getString(0) == "text/plain" && out(1).isNullAt(1), s"text row: ${out(1)}")
  }
}
