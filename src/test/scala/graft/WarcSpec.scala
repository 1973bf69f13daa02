package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc

/** WARC source (sources/Warc.scala): framing round-trip, gzip member
  * concatenation, corrupt-record isolation with resync, and the scan
  * itself — every byte of the parser contract, off-cluster first, then
  * through the distributed source. */
class WarcSpec extends SparkSpec {

  private def record(uri: String, payload: String,
      version: String = "WARC/1.0", ctype: String = "text/plain"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeRecord(bos, "response", s"<urn:test:$uri>", uri,
      "2026-01-01T00:00:00Z", ctype,
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8), version)
    bos.toByteArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] =
    parts.reduce(_ ++ _)

  test("single record round-trips every header and the exact payload") {
    val rs = Warc.parseAll("f", record("http://x/1", "hello warc")).toList
    assert(rs.size === 1)
    val r = rs.head
    assert(r.error === null)
    assert(r.warc_type === "response")
    assert(r.record_id === "<urn:test:http://x/1>")
    assert(r.target_uri === "http://x/1")
    assert(r.warc_date === "2026-01-01T00:00:00Z")
    assert(r.content_type === "text/plain")
    assert(r.content_length === 10L)
    assert(new String(r.payload, "UTF-8") === "hello warc")
    assert(r.rec_idx === 0 && r.skipped_bytes === 0L)
  }

  test("multi-record file parses in order; empty payload is a record, not an error") {
    val rs = Warc.parseAll("f", cat(
      record("u0", "aaa"), record("u1", ""), record("u2", "ccc"))).toList
    assert(rs.map(_.target_uri) === List("u0", "u1", "u2"))
    assert(rs.map(_.rec_idx) === List(0, 1, 2))
    assert(rs(1).content_length === 0L && rs(1).error === null)
  }

  test("payload bytes are length-framed: embedded CRLFCRLF and 'WARC/1.0' text survive") {
    val tricky = "line1\r\n\r\nWARC/1.0\r\nnot-a-header: x"
    val rs = Warc.parseAll("f", cat(record("u0", tricky), record("u1", "tail"))).toList
    assert(rs.map(_.error) === List(null, null))
    assert(new String(rs.head.payload, "UTF-8") === tricky)
    assert(rs(1).target_uri === "u1")
  }

  test("header names are case-insensitive, values trimmed") {
    val raw = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-TARGET-URI:   http://y/2  \r\n" +
      "content-length: 3\r\n" +
      "\r\nxyz\r\n\r\n").getBytes("US-ASCII")
    val rs = Warc.parseAll("f", raw).toList
    assert(rs.size === 1 && rs.head.error === null)
    assert(rs.head.target_uri === "http://y/2")
    assert(rs.head.warc_type === "response")
  }

  test("corrupt version line isolates ONE error row and resyncs to the next record") {
    val rs = Warc.parseAll("f", cat(
      record("u0", "good0"),
      record("uBad", "broken", version = "WARC/9.9"),
      record("u2", "good2"))).toList
    assert(rs.size === 3)
    assert(rs.map(_.error) === List(null, "bad-version", null))
    assert(rs(1).skipped_bytes > 0)
    assert(rs.map(_.target_uri) === List("u0", null, "u2"))
  }

  test("corrupt final record consumes to EOF without looping") {
    val rs = Warc.parseAll("f", cat(
      record("u0", "good0"),
      record("uBad", "broken", version = "WARC/9.9"))).toList
    assert(rs.size === 2)
    assert(rs(1).error === "bad-version")
  }

  test("truncated payload (Content-Length past EOF) is an error row") {
    val full = record("u0", "0123456789")
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 8)
    val rs = Warc.parseAll("f", cut).toList
    assert(rs.size === 1 && rs.head.error === "truncated")
  }

  test("missing Content-Length is an error row") {
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload").getBytes("US-ASCII")
    val rs = Warc.parseAll("f", raw).toList
    assert(rs.map(_.error) === List("bad-content-length"))
  }

  test("concatenated gzip members inflate to the same records as the plain file") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val plain = cat(record("u0", "aaa"), record("u1", "bbb"))
    val gz = cat(gzMember(record("u0", "aaa")), gzMember(record("u1", "bbb")))
    val a = Warc.parseAll("f", plain).toList
    val b = Warc.parseAll("f.gz", gz).toList
    assert(a.map(r => (r.target_uri, new String(r.payload, "UTF-8"))) ===
      b.map(r => (r.target_uri, new String(r.payload, "UTF-8"))))
  }

  test("corrupt gzip member mid-segment: earlier members' records survive, tail is ONE error row") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val m0 = gzMember(record("u0", "first member"))
    val m1 = gzMember(record("u1", "second member"))
    // flip a byte inside m1's deflate stream (past the 10-byte header)
    val bad = m1.clone(); bad(12) = (bad(12) ^ 0x5a).toByte
    val rs = Warc.parseAll("f.gz", cat(m0, bad)).toList
    assert(rs.size === 2, s"got $rs")
    assert(rs.head.target_uri === "u0" && rs.head.error === null)
    assert(rs(1).error === "bad-gzip-member")
    assert(rs(1).skipped_bytes === bad.length.toLong)
    // and the JDK silent-truncation shape (malformed next-member HEADER)
    // must also surface, not vanish
    val badHeader = m1.clone(); badHeader(2) = 7 // CM != deflate
    val rs2 = Warc.parseAll("f.gz", cat(m0, badHeader)).toList
    assert(rs2.map(_.error) === List(null, "bad-gzip-member"))
    // a corrupted TRAILER (crc mismatch) discards that member's partial
    // payload rather than emitting half-inflated bytes
    val badCrc = m1.clone(); badCrc(m1.length - 5) = (badCrc(m1.length - 5) ^ 1).toByte
    val rs3 = Warc.parseAll("f.gz", cat(m0, badCrc)).toList
    assert(rs3.map(_.error) === List(null, "bad-gzip-member"))
  }

  private def gzMemberOf(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("a record SPANNING gzip members parses via the bounded carry, identical to plain") {
    val plain = cat(record("u0", "alpha"), record("u1", "b" * 300), record("u2", "omega"))
    // cut the byte stream at arbitrary offsets unaligned with any record
    for (cuts <- Seq(Seq(13), Seq(7, 90, 91, 200), (1 until plain.length by 23).toSeq)) {
      val bounds = (0 +: cuts.filter(_ < plain.length) :+ plain.length).distinct.sorted
      val gz = bounds.sliding(2).map { case Seq(a, b) =>
        gzMemberOf(java.util.Arrays.copyOfRange(plain, a, b))
      }.reduce(_ ++ _)
      val a = Warc.parseAll("f", plain).toList.map(key)
      val b = Warc.parseAll("f.gz", gz).toList.map(key)
      assert(b === a, s"cuts=$cuts")
    }
  }

  test("streaming walk: corrupt record spanning members still isolates ONE row with resync") {
    val plain = cat(
      record("u0", "good0"),
      record("uBad", "broken-" * 40, version = "WARC/9.9"),
      record("u2", "good2"))
    // member-per-record AND an adversarial 17-byte-member grid must both
    // match the plain parse (error name, skipped accounting, order)
    val perRecordCut = {
      val r0 = record("u0", "good0")
      val rb = record("uBad", "broken-" * 40, version = "WARC/9.9")
      val r2 = record("u2", "good2")
      cat(gzMemberOf(r0), gzMemberOf(rb), gzMemberOf(r2))
    }
    val fineCut = (0 until plain.length by 17).map { a =>
      gzMemberOf(java.util.Arrays.copyOfRange(plain, a,
        math.min(a + 17, plain.length)))
    }.reduce(_ ++ _)
    val want = Warc.parseAll("f", plain).toList
      .map(r => (r.target_uri, r.error, r.skipped_bytes))
    for ((gz, tag) <- Seq((perRecordCut, "perRecord"), (fineCut, "fine"))) {
      val got = Warc.parseAll("f.gz", gz).toList
        .map(r => (r.target_uri, r.error, r.skipped_bytes))
      assert(got === want, tag)
    }
  }

  test("a gzip member inflating past the member cap is one error row; earlier records survive") {
    val m0 = gzMemberOf(record("u0", "fine"))
    val big = gzMemberOf(record("uBig", "z" * 4096))
    val rs = Warc.parseAll("f.gz", cat(m0, big), maxMemberBytes = 1024).toList
    assert(rs.map(_.error) === List(null, "gzip-member-too-large"))
    assert(rs.head.target_uri === "u0")
    assert(rs(1).skipped_bytes === big.length.toLong)
  }

  test("a record outgrowing the carry cap is record-too-large with full-size accounting; later records parse") {
    val bigRec = record("uBig", "q" * 5000)
    val plain = cat(record("u0", "pre"), bigRec, record("u2", "post"))
    // small members force the big record through the carry; cap below it
    val gz = (0 until plain.length by 64).map { a =>
      gzMemberOf(java.util.Arrays.copyOfRange(plain, a,
        math.min(a + 64, plain.length)))
    }.reduce(_ ++ _)
    val rs = Warc.parseAll("f.gz", gz, maxCarryBytes = 1024).toList
    assert(rs.map(_.error) === List(null, "record-too-large", null))
    assert(rs.map(_.target_uri) === List("u0", null, "u2"))
    // skipped accounts the record's FULL framed size (header + payload)
    assert(rs(1).skipped_bytes === bigRec.length.toLong - 4) // minus trailing CRLFCRLF
  }

  test("fuzz: random member grids + random byte flips never throw; surviving records are byte-exact, none duplicated") {
    val rnd = new scala.util.Random(147)
    for (trial <- 1 to 60) {
      val recs = (0 until 1 + rnd.nextInt(5)).map(i =>
        (s"u$trial-$i", rnd.alphanumeric.take(rnd.nextInt(200)).mkString))
      val plain = recs.map { case (u, p) => record(u, p) }.reduce(_ ++ _)
      // random member grid (1..n cuts at arbitrary offsets)
      val cuts = (0 +: Seq.fill(rnd.nextInt(6))(rnd.nextInt(plain.length))
        :+ plain.length).distinct.sorted
      val gz = cuts.sliding(2).map { case Seq(a, b) =>
        gzMemberOf(java.util.Arrays.copyOfRange(plain, a, b))
      }.reduce(_ ++ _).clone()
      // flip one random byte anywhere in the compressed stream
      val at = rnd.nextInt(gz.length)
      gz(at) = (gz(at) ^ (1 + rnd.nextInt(255))).toByte
      val out = Warc.parseAll("f.gz", gz).toList // must not throw
      val byUri = recs.toMap
      val goodUris = out.filter(_.error == null).map(_.target_uri)
      assert(goodUris.distinct.size == goodUris.size,
        s"trial $trial: record parsed twice after corruption")
      out.filter(_.error == null).foreach { r =>
        // any record that DID parse must carry its exact original payload
        byUri.get(r.target_uri).foreach { p =>
          assert(new String(r.payload, "UTF-8") == p,
            s"trial $trial: corrupted payload surfaced as clean")
        }
      }
    }
  }

  test("garbage bytes are one bad-gzip/bad-version row, never an exception") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
    val rs = Warc.parseAll("f", junk).toList
    assert(rs.size === 1 && rs.head.error != null)
    // gzip magic with a broken body must also isolate
    val fakeGz = Array[Byte](0x1f.toByte, 0x8b.toByte) ++ junk
    val rs2 = Warc.parseAll("f", fakeGz).toList
    assert(rs2.size === 1 && rs2.head.error === "bad-gzip")
  }

  test("streaming scan (A4 re-walk) sees segments as they land, batch-parity per record") {
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toString
    def writeSegment(name: String, recs: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), recs)
    writeSegment("seg0.warc", cat(record("u0", "aaa"), record("u1", "bbb")))
    val parsed = Warc.scanStream(spark, dir).toDF()
      .select(col("target_uri"), col("content_length"), col("error"))
    val q = parsed.writeStream.format("memory").queryName("warc_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a later micro-batch picks up a NEW segment (with a corrupt record)
      writeSegment("seg1.warc", cat(
        record("uBad", "broken", version = "WARC/9.9"), record("u2", "cc")))
      q.processAllAvailable()
      val rows = spark.sql(
        "select target_uri, content_length, error from warc_stream_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(rows === Set(
        ("u0", 3L, null), ("u1", 3L, null),
        (null, -1L, "bad-version"), ("u2", 2L, null)))
    } finally q.stop()
  }

  private def splitUnion(file: Array[Byte], split: Long,
      maxRec: Long = 4096L): List[graft.sources.WarcRecord] =
    (0L until file.length.toLong by split).flatMap { s =>
      val e = math.min(s + split, file.length.toLong)
      val bufStart = math.max(0L, s - 1)
      val bufEnd = math.min(file.length.toLong, e + maxRec)
      val buf = java.util.Arrays.copyOfRange(file, bufStart.toInt, bufEnd.toInt)
      Warc.parseRange("f", buf, bufStart, s, e, file.length.toLong).toList
    }.toList

  private def key(r: graft.sources.WarcRecord) =
    (r.target_uri, r.error, Option(r.payload).map(new String(_, "UTF-8")).orNull)

  test("byte-range splits are invariant: every VALID record exactly once, ANY split grid") {
    // records of varied sizes incl. an empty payload
    val file = cat(
      record("u0", "alpha beta gamma delta"),
      record("u1", ""),
      record("u3", "x" * 257),
      record("u4", "tail words"))
    val whole = Warc.parseAll("f", file).toList.map(key)
    for (split <- Seq(1L, 7L, 64L, 100L, 257L, file.length / 2L, file.length.toLong))
      assert(splitUnion(file, split).map(key) === whole, s"split=$split")
  }

  test("splits over a corrupt region: good records never lost or duplicated, errors best-effort") {
    val file = cat(
      record("u0", "alpha"),
      record("uBad", "broken", version = "WARC/9.9"),
      record("u2", "omega"))
    val wholeGood = Warc.parseAll("f", file).toList.filter(_.error == null).map(key)
    val wholeErrs = Warc.parseAll("f", file).count(_.error != null)
    for (split <- Seq(1L, 13L, 50L, file.length.toLong)) {
      val got = splitUnion(file, split)
      assert(got.filter(_.error == null).map(key) === wholeGood, s"split=$split")
      // a corrupt region surfaces only when reached sequentially by its
      // owner split — never MORE errors than the authoritative scan
      assert(got.count(_.error != null) <= wholeErrs, s"split=$split")
    }
    // whole-file-as-one-split IS the authoritative scan
    assert(splitUnion(file, file.length.toLong).count(_.error != null) === wholeErrs)
  }

  test("a record exceeding the split overshoot is record-too-large, not unbounded memory") {
    val big = record("uBig", "y" * 500)
    val file = cat(record("u0", "small"), big, record("u2", "after"))
    // budget (~300 B) fits the small records but not the 500-byte-payload
    // one: the split that owns its start cannot see its end
    val got = splitUnion(file, 80L, maxRec = 300L)
    assert(got.exists(_.error == "record-too-large"), got.map(_.error).toList)
    // the small records around it still parse
    assert(got.count(_.error == null) === 2, got.map(key))
  }

  test("scanSplits over the fixture matches the whole-file scan (plain AND gz fallback)") {
    val fx = Warc.ensureFixture(spark, sf())
    def normalize(ds: org.apache.spark.sql.Dataset[graft.sources.WarcRecord]) =
      ds.toDF().filter(col("error").isNull)
        .select(col("target_uri"), md5(col("payload")).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val whole = normalize(Warc.scan(spark, fx))
    val split = normalize(Warc.scanSplits(spark, fx, splitBytes = 1024))
    assert(split === whole)
    // corruption accounting is best-effort under splitting (a corrupt
    // start just past a boundary has no marker to claim) — never MORE
    // than the authoritative whole-file scan, and gz shards (whole-file
    // fallback) keep exact parity
    val errWhole = Warc.scan(spark, fx).filter(_.error != null).count()
    val errSplit = Warc.scanSplits(spark, fx, splitBytes = 1024)
      .filter(_.error != null).count()
    assert(errSplit <= errWhole && errWhole > 0)
  }

  test("distributed scan over the fixture matches the generating table") {
    val fx = Warc.ensureFixture(spark, sf())
    val got = Warc.scan(spark, fx).toDF()
    val good = got.filter(col("error").isNull)
    val bad = got.filter(col("error").isNotNull)

    val expect = graft.sources.Tables.documents(spark, sf())
      .filter(col("doc_id") % 7 === 0)
    val nCorrupt = expect.filter(col("doc_id") % 70 === 0).count()
    assert(bad.count() === nCorrupt)
    assert(bad.select("error").distinct().collect().map(_.getString(0)).toSet
      === (if (nCorrupt > 0) Set("bad-version") else Set.empty[String]))

    // every good record's payload digest equals the source row's text digest
    val byId = good.select(
      regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
      md5(col("payload")).as("d1"))
    val joined = byId.join(
      expect.select(col("doc_id"), md5(col("text")).as("d2")), Seq("doc_id"))
    assert(joined.count() === expect.count() - nCorrupt)
    assert(joined.filter(col("d1") =!= col("d2")).count() === 0)
  }

  test("anchor-text extraction canonicalizes every messy href and sees hub fan-in") {
    val out = graft.queries.ParticipantQueries.anchorText(spark, sf())
      .collect()
    assert(out.nonEmpty)
    val urls = out.map(_.getAs[String]("target_url"))
    // the fixture hrefs carry WWW./:80/trailing-slash/utm_ noise; NONE of
    // it may survive canonicalization
    assert(urls.forall(u => !u.contains("WWW.") && !u.contains("www.")), urls.take(3).mkString(","))
    assert(urls.forall(u => !u.contains(":80")), "default port must be stripped")
    assert(urls.forall(u => !u.contains("utm_")), "utm params must be dropped")
    assert(urls.forall(u => !u.stripPrefix("http://").endsWith("/")),
      "trailing slash must be stripped")
    // surviving non-utm params come out byte-sorted
    assert(urls.filter(_.contains("?")).forall(_.endsWith("?aa=1&ref=2")))
    // hub targets (link 0 of every page) accumulate fan-in from several
    // hosts — the aggregation half of the operator has real work
    val top = out.head
    assert(top.getAs[Long]("inlinks") >= 5L, s"hub fan-in missing: $top")
    assert(top.getAs[Long]("n_source_hosts") >= 3L)
    // anchors are 2-word phrases from the source docs (never tag syntax)
    assert(out.forall(r => !r.getAs[String]("top_anchor").contains("<")))
  }
}
