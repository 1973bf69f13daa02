package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.ops.{ChunkAlgebra, ChunkCommand, ChunkCommandOp}
import graft.pipeline.{Consolidate, Renditions}
import graft.sources.{DirectoryIngest, Tables, Warc}

/** Participant-pattern query surface: raw-file ingestion (B9/A3),
  * chunk-command log fold (D), rendition extraction (B3), sentence
  * chunking with framing (B5) — each oracle-backed. */
object ParticipantQueries {

  /** Q29 — raw-file directory ingestion: a deterministic fixture tree (one
    * .txt per documents row with doc_id % 10 == 0) is scanned with the
    * binaryFile source, turned into CREATE events, folded, and joined with
    * content digests — reference DirectoryIngestor
    * (participants/implementations.kt:334-341). The oracle recomputes
    * name/size/digest straight from the generating table, so the whole
    * write → walk → ingest → fold loop must round-trip exactly. */
  def ingestDir(spark: SparkSession, dir: String): DataFrame = {
    val fx = DirectoryIngest.ensureFixture(spark, dir, modulo = 10)
    val scanned = DirectoryIngest.scan(spark, fx)
      .localCheckpoint(true) // eager: two consumers; blocks release with the result
    val records = Consolidate.batch(DirectoryIngest.asEvents(scanned)).toDF()
    val digests = scanned.select(
      regexp_extract(col("path"), "([0-9]+)\\.txt$", 1).cast("long").as("id"),
      col("length").as("n_bytes"),
      md5(col("content")).as("digest"))
    records.select(col("id"), col("name").as("file_name"),
      col("representation.createdBy").as("created_by"))
      .join(digests, Seq("id"))
      .orderBy(col("id"))
  }

  val ingestDirSql: String =
    """SELECT doc_id AS id,
      |  CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
      |  'directory' AS created_by,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents WHERE doc_id % 10 = 0 ORDER BY id""".stripMargin

  /** Q147 — WARC segment ingestion (sources/Warc.scala): the Common-Crawl
    * container format, the shape a 100 TB pretraining crawl actually
    * arrives in. A deterministic 8-segment fixture (plain .warc on even
    * shards, per-record-gzip-member .warc.gz on odd) is scanned with the
    * distributed binaryFile source and parsed record-sequentially per
    * file; every doc_id % 70 == 0 record carries a corrupt version line
    * that must isolate as an error row (absent here, pinned by WarcSpec)
    * with resync to the next record — never fail the scan. The oracle
    * recomputes uri/type/length/digest/compression straight from the
    * generating table, so header round-trip, payload framing, gzip member
    * concatenation, AND corrupt-record exclusion are all hash-pinned. */
  def warcIngest(spark: SparkSession, dir: String): DataFrame = {
    val fx = Warc.ensureFixture(spark, dir)
    Warc.scan(spark, fx).toDF()
      .filter(col("error").isNull)
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("target_uri"), col("content_type"),
        col("content_length").as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("path").endsWith(".warc.gz").as("compressed"))
      .orderBy(col("doc_id"))
  }

  val warcIngestSql: String =
    """SELECT doc_id,
      |  'http://graft.test/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'text/plain; charset=utf-8' AS content_type,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  ((doc_id // 7) % 2 = 1) AS compressed
      |FROM documents WHERE doc_id % 7 = 0 AND doc_id % 70 <> 0
      |ORDER BY doc_id""".stripMargin

  /** Q210 — ANCHOR-TEXT AGGREGATION over the HTML crawl fixture: the
    * classic web-scale quality/retrieval signal (the anchor-text index of
    * the PageRank-era engines, and a first-class relevance feature in
    * every public web-search stack): extract `<a href>` links from
    * rendered HTML pages, canonicalize the often-messy hrefs (UrlOps —
    * www-label/port/trailing-slash/utm noise all appear in the fixture),
    * and aggregate per canonical target: in-link count, distinct linking
    * hosts, and the dominant anchor phrase (count desc, phrase asc).
    *
    * Everything is pure-Column codegen: regexp_extract_all pulls whole
    * `<a …>…</a>` tags, per-tag regexps split href/anchor, UrlOps
    * canonicalization is the audited regex chain. Per-target aggregation
    * is ONE exchange on the canonical URL (at 100 TB the pages never
    * shuffle — only the extracted (target, host, anchor) triples, a few
    * dozen bytes each, the classic anchor-index build shape). The oracle
    * reconstructs every (source, target, anchor) triple from the
    * documents-table arithmetic the fixture generator used (q147
    * posture), so tag extraction, canonicalization, host attribution,
    * and the dominant-anchor window are all hash-pinned. */
  def anchorText(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both consumers (per-target agg + anchor mode) FileScan the
    // build-once link artifact — no per-consumer WARC re-parse, and no
    // checkpoint needed: re-reading the small parquet twice is the plan
    val links = ClusterArtifacts.htmlLinks(spark, dir)
      .select(col("src_host"), col("target_url"), col("anchor"))
    val agg = links.groupBy(col("target_url"))
      .agg(count(lit(1)).as("inlinks"),
        count_distinct(col("src_host")).as("n_source_hosts"))
    val topAnchor = links.groupBy(col("target_url"), col("anchor"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__r", row_number().over(Window.partitionBy(col("target_url"))
        .orderBy(col("__n").desc, col("anchor").asc)))
      .filter(col("__r") === 1)
      .select(col("target_url"), col("anchor").as("top_anchor"),
        col("__n").as("top_anchor_n"))
    agg.join(topAnchor, Seq("target_url"))
      .orderBy(col("inlinks").desc, col("target_url").asc)
      .limit(30)
  }

  val anchorTextSql: String =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |src AS (
      |  SELECT doc_id AS d, string_split(text, ' ') AS w
      |  FROM documents WHERE doc_id % 5 = 0),
      |links AS (
      |  SELECT s.d, j.j,
      |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
      |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS t,
      |    array_to_string(w[CAST(3 * j.j + 1 AS BIGINT):CAST(3 * j.j + 2 AS BIGINT)], ' ') AS anchor
      |  FROM src s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
      |  WHERE j.j < (s.d % 4) + 1),
      |tagged AS (
      |  SELECT 's' || CAST(d % 7 AS VARCHAR) || '.example' AS src_host,
      |    'http://s' || CAST(t % 7 AS VARCHAR) || '.example/p/' || CAST(t AS VARCHAR)
      |      || CASE WHEN t % 3 = 0 THEN '?aa=1&ref=2' ELSE '' END AS target_url,
      |    anchor
      |  FROM links),
      |agg AS (
      |  SELECT target_url, CAST(count(*) AS BIGINT) AS inlinks,
      |    CAST(count(DISTINCT src_host) AS BIGINT) AS n_source_hosts
      |  FROM tagged GROUP BY target_url),
      |anchors AS (
      |  SELECT target_url, anchor, CAST(count(*) AS BIGINT) AS __n
      |  FROM tagged GROUP BY target_url, anchor),
      |top_anchor AS (
      |  SELECT target_url, anchor AS top_anchor, __n AS top_anchor_n
      |  FROM (SELECT *, row_number() OVER (PARTITION BY target_url
      |          ORDER BY __n DESC, anchor) AS r FROM anchors)
      |  WHERE r = 1)
      |SELECT a.target_url, a.inlinks, a.n_source_hosts,
      |  t.top_anchor, t.top_anchor_n
      |FROM agg a JOIN top_anchor t USING (target_url)
      |ORDER BY a.inlinks DESC, a.target_url LIMIT 30""".stripMargin

  /** Q217 — ANCHOR-TEXT RETRIEVAL INDEX: rank pages by what OTHER pages'
    * link text says about them — the other half of the anchor signal
    * q210 censuses, and the classic web-relevance feature (anchor terms
    * describe the TARGET better than its own body; every PageRank-era
    * engine indexed them as target-document surrogates). Each target's
    * in-link anchors concatenate into an anchor-document (read off the
    * build-once link artifact, never a re-parse), and the exact
    * integer-fixed-point BM25 (q45's formulation, bit-replayable) ranks
    * targets for the standard term bag. Bag-of-words stats are
    * concatenation-ORDER-FREE (tf/dl only), so the nondeterministic
    * collect_list order cannot reach the scores. The oracle reconstructs
    * every anchor from the fixture arithmetic (q210 posture), rebuilds
    * the token bags, and replays the full BM25 chain.
    *
    * Scale: the anchor table is the bounded extraction output (a few
    * dozen bytes per link, never the pages); one groupBy(dst) builds the
    * anchor-docs, then the q45 scan shape over a table ~|links| in size. */
  def anchorIndex(spark: SparkSession, dir: String): DataFrame =
    // the anchor-doc table is itself a build-once artifact now (round 12:
    // it also serves the `/search` anchor leg) — scores are unchanged
    // because BM25's stats are concatenation-order-free
    graft.ops.TextSearch.bm25TopK(
      ClusterArtifacts.anchorDocs(spark, dir), "dst", "anchor_text",
      TextQueries.Bm25Terms, 20)

  val anchorIndexSql: String = {
    val termList = TextQueries.Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH n AS (SELECT count(*) AS n FROM documents),
       |src AS (
       |  SELECT doc_id AS d, string_split(text, ' ') AS w
       |  FROM documents WHERE doc_id % 5 = 0),
       |links AS (
       |  SELECT s.d, j.j,
       |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
       |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS t,
       |    array_to_string(w[CAST(3 * j.j + 1 AS BIGINT):CAST(3 * j.j + 2 AS BIGINT)], ' ') AS anchor
       |  FROM src s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
       |  WHERE j.j < (s.d % 4) + 1),
       |atoks AS (
       |  SELECT t AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM links),
       |base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM atoks GROUP BY doc_id),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sdl
       |  FROM base),
       |tfrows AS (
       |  SELECT a.doc_id, b.dl, a.term, CAST(count(*) AS BIGINT) AS tf
       |  FROM atoks a JOIN base b USING (doc_id)
       |  WHERE a.term IN ($termList)
       |  GROUP BY a.doc_id, b.dl, a.term),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfrows GROUP BY term),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(round(((2.0 * CAST((n_docs - df) AS DOUBLE) + 1.0)
       |                / (2.0 * CAST(df AS DOUBLE) + 1.0)) * 1000000.0, 0) AS BIGINT)
       |    * CAST(round(((CAST(tf AS DOUBLE) * 2.2)
       |                  / (CAST(tf AS DOUBLE)
       |                     + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
       |                                             / CAST(sdl AS DOUBLE))))) * 1000000.0, 0) AS BIGINT)
       |      AS term_score
       |  FROM tfrows JOIN dft USING (term) CROSS JOIN stats)
       |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_e12,
       |  CAST(count(*) AS BIGINT) AS n_terms_hit
       |FROM scored GROUP BY doc_id
       |ORDER BY score_e12 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Q219 — HOST CITATION MATRIX: the page-level link graph rolled up to
    * host→host edges — the aggregation level where TrustRank-era
    * policies actually act (whole-host boosts/penalties, link-exchange
    * detection between SITES): per directed host pair, distinct
    * page-edge count, distinct linking/linked pages, the reverse
    * direction's edge count, and the signed asymmetry in micro units
    * ((a→b − b→a)·10⁶ div (a→b + b→a): +1e6 = pure citation, 0 = a
    * perfectly reciprocal exchange ring — the q216 reciprocity census
    * sharpened to WHICH pair). Oracle replays from the fixture's
    * generating arithmetic.
    *
    * Scale: the distinct page-edge set is one exchange (it is the
    * artifact scan at census cost); the host rollup is a 49-key hash
    * agg, and the reverse join runs on the ROLLED-UP table (|hosts|²
    * bounded), never the page edges. */
  def hostCitation(spark: SparkSession, dir: String): DataFrame = {
    val agg = ClusterArtifacts.htmlLinks(spark, dir)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src_host"), col("dst_host"), col("src"), col("dst"))
      .distinct()
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_edges"),
        count_distinct(col("src")).as("n_src_pages"),
        count_distinct(col("dst")).as("n_dst_pages"))
      .localCheckpoint(true) // two consumers: forward rows + reverse join
    val back = agg.select(col("dst_host").as("src_host"),
      col("src_host").as("dst_host"), col("n_edges").as("__b"))
    agg.join(back, Seq("src_host", "dst_host"), "left")
      .withColumn("n_back", coalesce(col("__b"), lit(0L)))
      .withColumn("asym_micro",
        expr("(n_edges - n_back) * 1000000 div (n_edges + n_back)"))
      .select(col("src_host"), col("dst_host"), col("n_edges"),
        col("n_src_pages"), col("n_dst_pages"), col("n_back"), col("asym_micro"))
      .orderBy(col("src_host"), col("dst_host"))
  }

  val hostCitationSql: String =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |pages AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
      |links AS (
      |  SELECT s.d AS src,
      |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
      |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS dst
      |  FROM pages s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
      |  WHERE j.j < (s.d % 4) + 1),
      |e AS (SELECT DISTINCT src, dst FROM links),
      |agg AS (
      |  SELECT 's' || CAST(src % 7 AS VARCHAR) || '.example' AS src_host,
      |    's' || CAST(dst % 7 AS VARCHAR) || '.example' AS dst_host,
      |    CAST(count(*) AS BIGINT) AS n_edges,
      |    CAST(count(DISTINCT src) AS BIGINT) AS n_src_pages,
      |    CAST(count(DISTINCT dst) AS BIGINT) AS n_dst_pages
      |  FROM e GROUP BY 1, 2)
      |SELECT a.src_host, a.dst_host, a.n_edges, a.n_src_pages, a.n_dst_pages,
      |  CAST(coalesce(b.n_edges, 0) AS BIGINT) AS n_back,
      |  CAST((a.n_edges - coalesce(b.n_edges, 0)) * 1000000
      |    // (a.n_edges + coalesce(b.n_edges, 0)) AS BIGINT) AS asym_micro
      |FROM agg a LEFT JOIN agg b
      |  ON b.src_host = a.dst_host AND b.dst_host = a.src_host
      |ORDER BY a.src_host, a.dst_host""".stripMargin

  /** Q176 — JSONL shard ingestion with corrupt-line isolation: the
    * de-facto LLM-corpus interchange format (every public dataset ships
    * *.jsonl), read PERMISSIVE with an explicit schema (no inference
    * pass) and an explicit `_corrupt` column — a truncated line (the
    * interrupted-upload shard tail, planted at doc_id % 33 == 1) costs
    * ONE null-data row, never the shard, and unknown extra fields
    * (planted `meta` objects) are ignored (the schema-drift tolerance
    * real dataset shards need). Census per language with the corrupt
    * rows surfacing under the null-language group; the oracle
    * reconstructs every aggregate from the generating table, so parse
    * fidelity, corruption isolation, and drift tolerance are all
    * hash-pinned. Unlike gzip WARC, JSONL is offset-splittable for
    * free (line splits), so the 100 TB read path is the stock json
    * source — the A19 error posture is the only thing to add. */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.sources.Jsonl.ensureFixture(spark, dir)
    graft.sources.Jsonl.scan(spark, fx)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("id")).as("sum_id"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
      .orderBy(col("lang"))
  }

  val jsonlIngestSql: String =
    """WITH good AS (
      |  SELECT lang, doc_id, len(text) AS ch FROM documents
      |  WHERE doc_id % 3 = 1 AND doc_id % 33 <> 1),
      |bad AS (
      |  SELECT COUNT(*) AS n FROM documents
      |  WHERE doc_id % 3 = 1 AND doc_id % 33 = 1)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_id,
      |  CAST(SUM(ch) AS BIGINT) AS sum_chars,
      |  CAST(0 AS BIGINT) AS n_corrupt
      |FROM good GROUP BY lang
      |UNION ALL
      |SELECT CAST(NULL AS VARCHAR) AS lang, CAST(n AS BIGINT) AS n_rows,
      |  CAST(NULL AS BIGINT) AS sum_id, CAST(NULL AS BIGINT) AS sum_chars,
      |  CAST(n AS BIGINT) AS n_corrupt
      |FROM bad WHERE n > 0
      |ORDER BY lang""".stripMargin

  /** Q151 — WARC → register → curate, the actual Common-Crawl ingest
    * chain END-TO-END in one declarative lineage (reference:
    * KafkaIntelligencePipeline.kt:304-391 ingest-to-enriched-records, with
    * the crawl container replacing the directory walk of
    * implementations.kt:334-341): the 8-segment WARC fixture is scanned
    * distributed (q147's source), good records become CREATE events whose
    * representation POINTS at `segment#rec_idx` (payloads stay off the
    * event log — the reference's ship-pointers posture), the events fold
    * through Consolidate.batch (A11), content is resolved back by a
    * uri-keyed join (C4's resolver shape at crawl granularity), `source`
    * derives from the SEGMENT the record physically arrived in, and the
    * registered documents run the full q100 curation chain (exact dedup →
    * paragraph dedup → LM-quality terciles → tail cut → per-segment token
    * packing). Corrupt crawl records (doc_id % 70 == 0, planted) drop at
    * the error gate before registration — A19 end-to-end. The oracle
    * replays the ENTIRE q100 CTE chain over the crawl subset with the
    * segment-derived source, so ingestion, registration, content
    * resolution, exclusion, and every curation stage are hash-pinned as
    * one unit. */
  def crawlCuration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fx = Warc.ensureFixture(spark, dir)
    val scanned = Warc.scan(spark, fx).toDF()
      .localCheckpoint(true) // eager: two consumers (events + content resolve)
    // response records only: a real segment's warcinfo/request/metadata
    // records must never register as documents
    val good = scanned.filter(col("error").isNull &&
      col("warc_type") === "response")
    val events = good.select(
      lit(graft.model.Command.Create).as("command"),
      regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("id"),
      lit(1L).as("timestamp"),
      lit(0L).as("seq"),
      col("target_uri").as("name"),
      struct(
        concat(col("path"), lit("#"), col("rec_idx")).as("path"),
        lit("warc").as("createdBy")).as("representation"),
      lit(null).cast("struct<values:map<string,string>,createdBy:string>").as("meta"))
      .as[graft.model.DataRecordEvent]
    val records = Consolidate.batch(events).toDF()
    // resolve content for the registered records by their crawl uri (the
    // pointer the representation names) — payload bytes never rode the
    // event fold
    val content = good.select(
      col("target_uri").as("name"),
      col("payload").cast("string").as("text"),
      concat(lit("crawl-"),
        regexp_extract(col("path"), "segment-([0-9]+)\\.warc", 1)).as("source"))
    val docs = records.select(col("id").as("doc_id"), col("name"))
      .join(content, Seq("name"))
      .select(col("doc_id"), col("source"), col("text"))
    PrepQueries.curationChain(docs)
  }

  /** The q100 oracle verbatim, re-rooted at the crawl subset with the
    * segment-derived source — the composition is pinned by construction
    * to "q100's semantics over exactly what the crawl delivered". */
  val crawlCurationSql: String =
    """WITH crawl_docs AS (
      |  SELECT doc_id,
      |    'crawl-' || CAST((doc_id // 7) % 8 AS VARCHAR) AS source, text
      |  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 70 <> 0),
      |""".stripMargin +
      PrepQueries.curationPipelineSql.stripPrefix("WITH ")
        .replace("FROM documents", "FROM crawl_docs")

  /** Q156 — crawl SNAPSHOT CHURN: the month-over-month diff census a
    * continuously-refreshed crawl corpus runs before re-curation (which
    * URLs appeared, vanished, changed content, stayed byte-identical —
    * and how many bytes each class moved). Snapshot A = doc_id % 3 == 0;
    * snapshot B drops every % 9 == 0 page (gone), adds % 9 == 1 pages
    * from the % 3 == 1 universe (new), and re-crawls % 6 == 0 pages with
    * changed content. ONE full-outer join on the URL key with content
    * digests — no content comparison beyond the digest, the shape that
    * holds when each snapshot is 100 TB. The oracle replays membership
    * arithmetic, digest equality, and the byte accounting. */
  def crawlChurn(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val snapA = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val snapB = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 9 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 6 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 3 === 1 && col("doc_id") % 9 === 1)
        .select(col("doc_id"), col("text")))
    val a = snapA.select(col("doc_id"), md5(col("text").cast("binary")).as("da"),
      length(col("text").cast("binary")).cast("long").as("ba"))
    val b = snapB.select(col("doc_id"), md5(col("text").cast("binary")).as("db"),
      length(col("text").cast("binary")).cast("long").as("bb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        when(col("da").isNull, "added")
          .when(col("db").isNull, "gone")
          .when(col("da") =!= col("db"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("ba"), lit(0L)).as("ba"),
        coalesce(col("bb"), lit(0L)).as("bb"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_urls"),
        sum(col("ba")).as("bytes_before"),
        sum(col("bb")).as("bytes_after"))
      .orderBy(col("status"))
  }

  val crawlChurnSql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS da,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS ba
      |  FROM documents WHERE doc_id % 3 = 0),
      |b AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 6 = 0 THEN text || ' updated' ELSE text END) AS db,
      |    CAST(octet_length(CAST(CASE WHEN doc_id % 6 = 0
      |      THEN text || ' updated' ELSE text END AS BLOB)) AS BIGINT) AS bb
      |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 9 <> 0
      |  UNION ALL
      |  SELECT doc_id, md5(text) AS db,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS bb
      |  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 9 = 1),
      |j AS (
      |  SELECT CASE WHEN a.da IS NULL THEN 'added'
      |              WHEN b.db IS NULL THEN 'gone'
      |              WHEN a.da <> b.db THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |    COALESCE(a.ba, 0) AS ba, COALESCE(b.bb, 0) AS bb
      |  FROM a FULL OUTER JOIN b USING (doc_id))
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_urls,
      |  CAST(SUM(ba) AS BIGINT) AS bytes_before,
      |  CAST(SUM(bb) AS BIGINT) AS bytes_after
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q30 — chunk-command log fold (SURVEY §2 D): a deterministic
    * adversarial command log per document — START, three ADDs, INSERT,
    * UPDATE, an out-of-bounds UPDATE (must no-op), MERGE, DELETE, and an
    * out-of-bounds INSERT (must no-op) — folded to final chunk state by
    * ChunkAlgebra.foldCommandLog. Reference: sequence_management.kt:5-27 +
    * SequenceTests.kt:8-41. The oracle states the closed-form final state,
    * so every step (ordering, OOB rules, merge joining) must be right. */
  def chunkCommands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val log = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      def wk(k: Int): String = if (k < w.length) w(k) else s"w$k"
      Seq(
        ChunkCommand(id, 1L, 0L, ChunkCommandOp.Start, 0, 0, null),
        ChunkCommand(id, 2L, 0L, ChunkCommandOp.Add, 0, 0, wk(0)),
        ChunkCommand(id, 2L, 1L, ChunkCommandOp.Add, 0, 0, wk(1)),
        ChunkCommand(id, 2L, 2L, ChunkCommandOp.Add, 0, 0, wk(2)),
        ChunkCommand(id, 3L, 0L, ChunkCommandOp.Insert, 1, 0, wk(3)),
        ChunkCommand(id, 4L, 0L, ChunkCommandOp.Update, 2, 0, wk(4)),
        ChunkCommand(id, 5L, 0L, ChunkCommandOp.Update, 9, 0, "zz"), // OOB no-op
        ChunkCommand(id, 6L, 0L, ChunkCommandOp.Merge, 1, 2, null),
        ChunkCommand(id, 7L, 0L, ChunkCommandOp.Delete, 0, 0, null),
        ChunkCommand(id, 8L, 0L, ChunkCommandOp.Insert, 5, 0, "q")) // OOB no-op
    }
    ChunkAlgebra.foldCommandLog(log)
      .select(col("id"), size(col("chunks")).cast("long").as("n_chunks"),
        concat_ws("|", col("chunks")).as("chunks"))
      .orderBy(col("id"))
  }

  // log trace: [] →ADDs [w0,w1,w2] →INSERT(1,w3) [w0,w3,w1,w2]
  // →UPDATE(2,w4) [w0,w3,w4,w2] →UPDATE(9) noop →MERGE(1,2) [w0,"w3 w4",w2]
  // →DELETE(0) ["w3 w4",w2] →INSERT(5) noop
  val chunkCommandsSql: String =
    """SELECT doc_id AS id, CAST(2 AS BIGINT) AS n_chunks,
      |  COALESCE(words[4], 'w3') || ' ' || COALESCE(words[5], 'w4')
      |    || '|' || COALESCE(words[3], 'w2') AS chunks
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      |ORDER BY id""".stripMargin

  /** Q31 — content-extraction rendition producer (B3): documents ingested
    * with a synthesized HTML original; the extraction producer strips the
    * markup and feeds txt renditions back through the fold as
    * UPSERT_DOCUMENT_REPRESENTATION events — the reference's Tika-shelling
    * producer loop (implementations.kt:150-187). The oracle checks the
    * digest of the extracted text against the pristine source text, so
    * extraction must round-trip exactly. */
  def renditionExtraction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val creates = Tables.documents(spark, dir).select(
      lit(Command.Create).as("command"),
      col("doc_id").as("id"),
      lit(1L).as("timestamp"),
      lit(0L).as("seq"),
      concat(lit("doc-"), col("doc_id")).as("name"),
      struct(
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")).as("path"),
        lit("inline").as("createdBy")).as("representation"),
      lit(null).cast("struct<values:map<string,string>,createdBy:string>").as("meta"))
      .as[DataRecordEvent]
    val original = Consolidate.batch(creates)
    val upserts = Renditions.extractTextEvents(original)
    val finalRecords = Consolidate.batch(creates.unionByName(upserts))
    finalRecords.toDF().select(
      col("id"),
      size(col("additionalRepresentations")).cast("long").as("n_reps"),
      element_at(col("additionalRepresentations"), 1).getField("createdBy").as("created_by"),
      md5(element_at(col("additionalRepresentations"), 1).getField("path").cast("binary")).as("digest"))
      .orderBy(col("id"))
  }

  val renditionExtractionSql: String =
    """SELECT doc_id AS id, CAST(1 AS BIGINT) AS n_reps,
      |  'extract-txt' AS created_by, md5(text) AS digest
      |FROM documents ORDER BY id""".stripMargin

  /** Q31b — DUAL rendition production (B3 txt + B3' html): both extraction
    * producers run over the same originals and feed the fold together; the
    * record ends with two additional representations, deterministically
    * ordered by createdBy ("extract-html" < "extract-txt"). The oracle
    * recomputes both digests from the pristine text, so the html wrap and
    * the txt strip must each round-trip exactly — the reference's dual
    * .txt/.html side-file behavior (implementations.kt:172-187). */
  def dualRenditions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val creates = Tables.documents(spark, dir).select(
      lit(Command.Create).as("command"),
      col("doc_id").as("id"),
      lit(1L).as("timestamp"),
      lit(0L).as("seq"),
      concat(lit("doc-"), col("doc_id")).as("name"),
      struct(
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")).as("path"),
        lit("inline").as("createdBy")).as("representation"),
      lit(null).cast("struct<values:map<string,string>,createdBy:string>").as("meta"))
      .as[DataRecordEvent]
    val original = Consolidate.batch(creates)
    val upserts = Renditions.extractTextEvents(original)
      .unionByName(Renditions.extractHtmlEvents(original))
    val finalRecords = Consolidate.batch(creates.unionByName(upserts))
    finalRecords.toDF().select(
      col("id"),
      size(col("additionalRepresentations")).cast("long").as("n_reps"),
      element_at(col("additionalRepresentations"), 1).getField("createdBy").as("html_by"),
      md5(element_at(col("additionalRepresentations"), 1).getField("path").cast("binary")).as("html_digest"),
      element_at(col("additionalRepresentations"), 2).getField("createdBy").as("txt_by"),
      md5(element_at(col("additionalRepresentations"), 2).getField("path").cast("binary")).as("txt_digest"))
      .orderBy(col("id"))
  }

  val dualRenditionsSql: String =
    """SELECT doc_id AS id, CAST(2 AS BIGINT) AS n_reps,
      |  'extract-html' AS html_by,
      |  md5('<html><body><p>' || text || '</p></body></html>') AS html_digest,
      |  'extract-txt' AS txt_by, md5(text) AS txt_digest
      |FROM documents ORDER BY id""".stripMargin

  /** Q32 — sentence chunking with START/LAST framing (B5): the corpus text
    * is punctuation-free, so a deterministic punctuated rendition is built
    * first (7-word sentences, terminal periods), then the chunker must
    * recover the sentence boundaries from the punctuation alone.
    * Reference: implementations.kt:56-89. */
  def sentenceChunks(spark: SparkSession, dir: String): DataFrame = {
    val punctuated = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("punct_text", concat_ws(" ", expr(
        "transform(sequence(0, cast(ceil(size(words)/7.0) as int) - 1)," +
          " i -> concat(concat_ws(' ', slice(words, i*7 + 1, 7)), '.'))")))
      .select(col("doc_id"), col("punct_text"))
    ChunkAlgebra.sentenceChunks(punctuated, "doc_id", "punct_text")
      .orderBy(col("doc_id"), col("idx"))
  }

  val sentenceChunksSql: String =
    """WITH punct AS (
      |  SELECT doc_id,
      |    array_to_string([array_to_string(words[(i*7)+1:(i+1)*7], ' ') || '.'
      |      FOR i IN range(0, CAST(ceil(len(words)/7.0) AS BIGINT))], ' ') AS punct_text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      |parts AS (
      |  SELECT doc_id, string_split(punct_text, '. ') AS p FROM punct)
      |SELECT doc_id, i - 1 AS idx,
      |  CASE WHEN len(p) = 1 THEN 'ONLY'
      |       WHEN i = 1 THEN 'START'
      |       WHEN i = len(p) THEN 'LAST'
      |       ELSE 'MID' END AS frame,
      |  CASE WHEN i < len(p) THEN p[i] || '.' ELSE p[i] END AS sentence
      |FROM parts, UNNEST(generate_series(1, len(p))) AS t(i)
      |ORDER BY doc_id, idx""".stripMargin

  /** Q34 — NLP parse-map producer (B6): the reference's parse producer
    * flattens per-sentence parses into `sentence_i` / `word_i_j` /
    * `pos_i_j` / `ne_i_j` map keys (implementations.kt:92-146); here the
    * tagger is the offline rule set (TextFunctions.posTag/neTag), the map
    * flattened to (id, key, value) rows like the q22 metadata view.
    * Single narrow pass: one posexplode, one 3-way struct explode. */
  def parseMap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    // spread: the per-word tag CASE chains (two regexes + suffix tests,
    // ×3 key kinds) are CPU-dense narrow work on a 1-2-split scan —
    // conditional round-robin widen, exchange-free at corpus scale
    val words = graft.ops.Dedup.spread(Tables.documents(spark, dir)
        .select(col("doc_id").as("id"), col("text")))
      .select(col("id"), posexplode(split(col("text"), " ")).as(Seq("idx", "w")))
      .withColumn("i", expr("idx div 7").cast("string"))
      .withColumn("j", (col("idx") % 7).cast("string"))
    val wordRows = words.select(col("id"), explode(array(
      struct(concat(lit("word_"), col("i"), lit("_"), col("j")).as("key"),
        col("w").as("value")),
      struct(concat(lit("pos_"), col("i"), lit("_"), col("j")).as("key"),
        TextFunctions.posTag(col("w")).as("value")),
      struct(concat(lit("ne_"), col("i"), lit("_"), col("j")).as("key"),
        TextFunctions.neTag(col("w")).as("value")))).as("kv"))
      .select(col("id"), col("kv.key").as("key"), col("kv.value").as("value"))
    val sentRows = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id").as("id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(words)/7.0) as int) - 1)," +
          " i -> concat_ws(' ', slice(words, i*7 + 1, 7)))")).as(Seq("si", "sent")))
      .select(col("id"), concat(lit("sentence_"), col("si").cast("string")).as("key"),
        col("sent").as("value"))
    wordRows.unionAll(sentRows).orderBy(col("id"), col("key"))
  }

  val parseMapSql: String = {
    import graft.functions.TextFunctions._
    def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")
    val posCase =
      s"""CASE WHEN regexp_matches(w, '^[0-9]+$$') THEN 'CD'
         |     WHEN w IN (${inList(PosDeterminers)}) THEN 'DT'
         |     WHEN w IN (${inList(PosConjunctions)}) THEN 'CC'
         |     WHEN w IN (${inList(PosPrepositions)}) THEN 'IN'
         |     WHEN w LIKE '%ing' THEN 'VBG'
         |     WHEN w LIKE '%ed' THEN 'VBD'
         |     WHEN w LIKE '%ly' THEN 'RB'
         |     WHEN w LIKE '%s' THEN 'NNS'
         |     ELSE 'NN' END""".stripMargin
    val neCase =
      """CASE WHEN regexp_matches(w, '^[0-9]+$') THEN 'NUMBER'
        |     WHEN regexp_matches(w, '^[a-z]+[0-9]+$') THEN 'IDENT'
        |     ELSE 'O' END""".stripMargin
    s"""WITH w AS (
       |  SELECT doc_id AS id, (t.i - 1) // 7 AS si, (t.i - 1) % 7 AS sj, words[t.i] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |       UNNEST(generate_series(1, len(words))) AS t(i)),
       |rows AS (
       |  SELECT id, 'word_' || si || '_' || sj AS key, w AS value FROM w
       |  UNION ALL
       |  SELECT id, 'pos_' || si || '_' || sj AS key, $posCase AS value FROM w
       |  UNION ALL
       |  SELECT id, 'ne_' || si || '_' || sj AS key, $neCase AS value FROM w
       |  UNION ALL
       |  SELECT doc_id AS id, 'sentence_' || t.i AS key,
       |    array_to_string(words[(t.i*7)+1:(t.i+1)*7], ' ') AS value
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |       UNNEST(generate_series(0, CAST(ceil(len(words)/7.0) AS BIGINT) - 1)) AS t(i))
       |SELECT id, key, value FROM rows ORDER BY id, key""".stripMargin
  }

  /** Q69 — the END-TO-END binary-document pipeline, the reference's
    * defining integration test re-expressed Spark-first
    * (KafkaIntelligencePipelineTests.kt:352-361: crawl directory → Tika
    * parse .docx → metadata): a GRFT binary fixture tree (with planted
    * corrupt files) is crawled with the binaryFile source, folded into
    * records whose representation POINTS at the file, content is resolved
    * by a path-keyed join, parsed columnar (magic/version/length/CRC),
    * and the outcome — txt rendition + {n_bytes, version} metadata, or
    * `!error` metadata for corrupt files — is registered back through a
    * second fold. The oracle recomputes everything (including which files
    * are corrupt) from the generating table, so the whole
    * write → crawl → resolve → parse → register loop must round-trip. */
  def binaryPipeline(spark: SparkSession, dir: String): DataFrame = {
    val fx = DirectoryIngest.ensureBinaryFixture(spark, dir, modulo = 7)
    val scanned = DirectoryIngest.scan(spark, fx, glob = "*.bin")
      .localCheckpoint(true) // eager: two consumers; blocks release with the result
    val creates = DirectoryIngest.asEvents(scanned)
    val records = Consolidate.batch(creates)
    val contentByPath = scanned.select(
      regexp_replace(col("path"), "^file:", "").as("path"), col("content"))
    val parseEvs = graft.pipeline.BinaryDocs.parseEvents(records, contentByPath)
    val finalRecords = Consolidate.batch(creates.unionByName(parseEvs))
    finalRecords.toDF().select(
      col("id"),
      col("name").as("file_name"),
      size(col("additionalRepresentations")).cast("long").as("n_reps"),
      md5(expr("try_element_at(additionalRepresentations, 1)").getField("path")
        .cast("binary")).as("digest"),
      expr("try_element_at(try_element_at(meta, 1).values, '!error')").as("error"),
      expr("try_element_at(try_element_at(meta, 1).values, 'n_bytes')")
        .cast("long").as("n_bytes"))
      .orderBy(col("id"))
  }

  val binaryPipelineSql: String =
    """SELECT doc_id AS id,
      |  CAST(doc_id AS VARCHAR) || '.bin' AS file_name,
      |  CAST(CASE WHEN doc_id % 70 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_reps,
      |  CASE WHEN doc_id % 70 = 0 THEN NULL ELSE md5(text) END AS digest,
      |  CASE WHEN doc_id % 70 = 0 THEN 'crc-mismatch' ELSE NULL END AS error,
      |  CASE WHEN doc_id % 70 = 0 THEN NULL
      |       ELSE CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) END AS n_bytes
      |FROM documents WHERE doc_id % 7 = 0 ORDER BY id""".stripMargin

  /** Q78 — the REAL-container end-to-end pipeline, the test3.docx analog
    * with an actual ZIP/OOXML archive instead of the synthetic GRFT
    * layout (reference: KafkaIntelligencePipelineTests.kt:352-361 — Tika
    * over a Word document): a docx-shaped fixture tree (with planted
    * CRC-corrupted archives) is crawled with the binaryFile source,
    * folded into records whose representation POINTS at the file, content
    * is resolved by a path-keyed left join, the container walked and its
    * `word/document.xml` text extracted on executors (ZipDocs), and the
    * outcome — text rendition + {n_entries, n_bytes} metadata, or
    * `!error = bad-zip` for corrupt archives — registered back through a
    * second fold. The oracle recomputes everything (extracted-text
    * digest, exact archive byte size, which files are corrupt) from the
    * generating table, so the whole
    * write → crawl → resolve → unzip → extract → register loop must
    * round-trip bit-exact. */
  def zipPipeline(spark: SparkSession, dir: String): DataFrame = {
    val fx = DirectoryIngest.ensureZipFixture(spark, dir, modulo = 11)
    val scanned = DirectoryIngest.scan(spark, fx, glob = "*.docx")
      .localCheckpoint(true) // eager: two consumers; blocks release with the result
    val creates = DirectoryIngest.asEvents(scanned)
    val records = Consolidate.batch(creates)
    val contentByPath = scanned.select(
      regexp_replace(col("path"), "^file:", "").as("path"), col("content"))
    val parseEvs = graft.pipeline.ZipDocs.parseEvents(records, contentByPath)
    val finalRecords = Consolidate.batch(creates.unionByName(parseEvs))
    finalRecords.toDF().select(
      col("id"),
      col("name").as("file_name"),
      size(col("additionalRepresentations")).cast("long").as("n_reps"),
      md5(expr("try_element_at(additionalRepresentations, 1)").getField("path")
        .cast("binary")).as("digest"),
      expr("try_element_at(try_element_at(meta, 1).values, '!error')").as("error"),
      expr("try_element_at(try_element_at(meta, 1).values, 'n_entries')")
        .cast("long").as("n_entries"),
      expr("try_element_at(try_element_at(meta, 1).values, 'n_bytes')")
        .cast("long").as("n_bytes"))
      .orderBy(col("id"))
  }

  val zipPipelineSql: String =
    s"""SELECT doc_id AS id,
      |  CAST(doc_id AS VARCHAR) || '.docx' AS file_name,
      |  CAST(CASE WHEN doc_id % 110 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_reps,
      |  CASE WHEN doc_id % 110 = 0 THEN NULL ELSE md5(text) END AS digest,
      |  CASE WHEN doc_id % 110 = 0 THEN 'bad-zip' ELSE NULL END AS error,
      |  CASE WHEN doc_id % 110 = 0 THEN NULL ELSE CAST(3 AS BIGINT) END AS n_entries,
      |  CASE WHEN doc_id % 110 = 0 THEN NULL
      |       ELSE octet_length(CAST(text AS BLOB)) + ${graft.pipeline.ZipDocs.fixedOverheadBytes}
      |       END AS n_bytes
      |FROM documents WHERE doc_id % 11 = 0 ORDER BY id""".stripMargin

  /** Q85 — the PDF end-to-end pipeline: the second REAL document format
    * through the crawl → resolve → parse → register loop (reference: the
    * Tika participant auto-detects every crawled file's type,
    * participants/implementations.kt:215-240 — PDF being the canonical
    * binary document alongside q78's .docx). The fixture tree holds
    * minimal single-page PDFs, HALF of them `/FlateDecode`-compressed
    * through a real zlib Deflater (odd multiples of 13), plus planted
    * header-corrupted files; the parser walks the COS structure, slices
    * streams by declared /Length, INFLATES the compressed half, and
    * extracts the Tj text. The oracle recomputes the extracted-text
    * digest for BOTH halves (the flate round-trip must be lossless) and
    * the exact byte size for the uncompressed half (closed-form:
    * overhead + text length — compressed sizes are compressor-specific
    * and nulled on both sides); corrupt files must isolate as
    * `!error = bad-pdf` (A19). */
  def pdfPipeline(spark: SparkSession, dir: String): DataFrame = {
    val fx = DirectoryIngest.ensurePdfFixture(spark, dir, modulo = 13)
    val scanned = DirectoryIngest.scan(spark, fx, glob = "*.pdf")
      .localCheckpoint(true) // eager: two consumers; blocks release with the result
    val creates = DirectoryIngest.asEvents(scanned)
    val records = Consolidate.batch(creates)
    val contentByPath = scanned.select(
      regexp_replace(col("path"), "^file:", "").as("path"), col("content"))
    val parseEvs = graft.pipeline.PdfDocs.parseEvents(records, contentByPath)
    val finalRecords = Consolidate.batch(creates.unionByName(parseEvs))
    finalRecords.toDF().select(
      col("id"),
      col("name").as("file_name"),
      size(col("additionalRepresentations")).cast("long").as("n_reps"),
      md5(expr("try_element_at(additionalRepresentations, 1)").getField("path")
        .cast("binary")).as("digest"),
      expr("try_element_at(try_element_at(meta, 1).values, '!error')").as("error"),
      expr("try_element_at(try_element_at(meta, 1).values, 'n_streams')")
        .cast("long").as("n_streams"),
      expr("try_element_at(try_element_at(meta, 1).values, 'filter')")
        .as("stream_filter"),
      when(expr("try_element_at(try_element_at(meta, 1).values, 'filter')") === "none",
        expr("try_element_at(try_element_at(meta, 1).values, 'n_bytes')"))
        .cast("long").as("n_bytes"))
      .orderBy(col("id"))
  }

  val pdfPipelineSql: String =
    s"""SELECT doc_id AS id,
      |  CAST(doc_id AS VARCHAR) || '.pdf' AS file_name,
      |  CAST(CASE WHEN doc_id % 130 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_reps,
      |  CASE WHEN doc_id % 130 = 0 THEN NULL ELSE md5(text) END AS digest,
      |  CASE WHEN doc_id % 130 = 0 THEN 'bad-pdf' ELSE NULL END AS error,
      |  CASE WHEN doc_id % 130 = 0 THEN NULL ELSE CAST(1 AS BIGINT) END AS n_streams,
      |  CASE WHEN doc_id % 130 = 0 THEN NULL
      |       WHEN doc_id % 26 = 0 THEN 'none' ELSE 'flate' END AS stream_filter,
      |  CASE WHEN doc_id % 130 = 0 OR doc_id % 26 <> 0 THEN NULL
      |       ELSE octet_length(CAST(text AS BLOB)) + ${graft.pipeline.PdfDocs.fixedOverheadBytes}
      |       END AS n_bytes
      |FROM documents WHERE doc_id % 13 = 0 ORDER BY id""".stripMargin

  /** Q91 — corpus-trained entity typing (ops/Ner): the distant-
    * supervision upgrade of the B7 entity stand-in, the q84/q86 move
    * applied to entities. Train: integer (token, type) votes from the
    * even-partkey half of the part catalog (p_name tokens labeled by
    * p_type — every token spans all six categories, so the model is
    * genuinely ambiguous). Apply: tag the HELD-OUT odd-partkey names by
    * context vote (own distribution + text-sum, ties type-asc) and score
    * against the true category. The oracle replays tokenization, the
    * vote table, the context sums, both argmax tie-breaks, and the
    * train/test split — every integer score must match bit-for-bit. */
  def nerTrained(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val votes = graft.ops.Ner.tokenVotes(
      part.filter(col("p_partkey") % 2 === 0), "p_name", "p_type")
    graft.ops.Ner.tag(
      part.filter(col("p_partkey") % 2 === 1), "p_partkey", "p_name", votes)
      .join(part.select(col("p_partkey"), col("p_type")), Seq("p_partkey"))
      .select(col("p_partkey"), col("pos"), col("tok"), col("ner_type"),
        col("score"), (col("ner_type") === col("p_type")).as("is_match"))
      .orderBy(col("p_partkey"), col("pos"))
  }

  val nerTrainedSql: String =
    """WITH votes AS (
      |  SELECT tok, p_type AS ner_type, CAST(COUNT(*) AS BIGINT) AS votes
      |  FROM (SELECT unnest(string_split(p_name, ' ')) AS tok, p_type
      |        FROM part WHERE p_partkey % 2 = 0)
      |  GROUP BY 1, 2),
      |toks AS (
      |  SELECT p_partkey, CAST(t.i - 1 AS INTEGER) AS pos, ws[t.i] AS tok
      |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws
      |        FROM part WHERE p_partkey % 2 = 1),
      |    UNNEST(range(1, len(ws) + 1)) AS t(i)),
      |own AS (
      |  SELECT t.p_partkey, t.pos, t.tok, v.ner_type, v.votes
      |  FROM toks t JOIN votes v USING (tok)),
      |ctx AS (
      |  SELECT p_partkey, ner_type, SUM(votes) AS ctx_votes
      |  FROM own GROUP BY 1, 2),
      |cand AS (
      |  SELECT t.p_partkey, t.pos, t.tok, c.ner_type,
      |    COALESCE(v.votes, 0) + c.ctx_votes AS score
      |  FROM toks t
      |  JOIN (SELECT DISTINCT tok FROM votes) g USING (tok)
      |  JOIN ctx c ON c.p_partkey = t.p_partkey
      |  LEFT JOIN votes v ON v.tok = t.tok AND v.ner_type = c.ner_type),
      |top AS (
      |  SELECT p_partkey, pos, tok, ner_type, score,
      |    row_number() OVER (PARTITION BY p_partkey, pos
      |      ORDER BY score DESC, ner_type ASC) AS rn
      |  FROM cand)
      |SELECT tp.p_partkey, tp.pos, tp.tok, tp.ner_type,
      |  CAST(tp.score AS BIGINT) AS score, (tp.ner_type = p.p_type) AS is_match
      |FROM top tp JOIN part p USING (p_partkey)
      |WHERE tp.rn = 1 ORDER BY tp.p_partkey, tp.pos""".stripMargin

  /** Q92 — corpus-derived POS tagging (ops/PosTag): trigram-HMM
    * max-sum Viterbi over integer fixed-point weights, self-trained
    * from the rule tagger's weak labels (the B6 upgrade, q84/q91
    * pattern). Every 7-word sentence is decoded exactly; the oracle
    * replays training (both fixed-point conditional-frequency tables)
    * and then checks the DECODE against brute-force enumeration of
    * every tag path per sentence (a recursive CTE) — an independent
    * algorithm, not a reimplementation of the DP — with the same
    * (score desc, path asc) tie-break. `is_match` records where the
    * learned sequence model agrees with the local rule tagger. */
  def posTrained(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.PosTag
    val docs = Tables.documents(spark, dir)
    val rule = graft.functions.TextFunctions.posTag _
    val words = PosTag.labeledWords(docs, "doc_id", "text", rule)
      .localCheckpoint(true) // eager: three consumers (emit, trans, rule replay)
    val dec = PosTag.decode(docs, "doc_id", "text",
      PosTag.emissions(words), PosTag.transitions(words))
    val ruleSent = words.groupBy(col("id").as("doc_id"), col("sent"))
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(pos, tag))), s -> s.tag)")).as("rule_tags"))
    dec.join(ruleSent, Seq("doc_id", "sent"))
      .select(col("doc_id"), col("sent"), col("n_words"), col("tags"),
        col("score_e6"), col("rule_tags"),
        (col("tags") === col("rule_tags")).as("is_match"))
      .orderBy(col("doc_id"), col("sent"))
  }

  val posTrainedSql: String = {
    import graft.functions.TextFunctions._
    def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")
    val posCase =
      s"""CASE WHEN regexp_matches(w, '^[0-9]+$$') THEN 'CD'
         |     WHEN w IN (${inList(PosDeterminers)}) THEN 'DT'
         |     WHEN w IN (${inList(PosConjunctions)}) THEN 'CC'
         |     WHEN w IN (${inList(PosPrepositions)}) THEN 'IN'
         |     WHEN w LIKE '%ing' THEN 'VBG'
         |     WHEN w LIKE '%ed' THEN 'VBD'
         |     WHEN w LIKE '%ly' THEN 'RB'
         |     WHEN w LIKE '%s' THEN 'NNS'
         |     ELSE 'NN' END""".stripMargin
    s"""WITH RECURSIVE
       |w AS (
       |  SELECT doc_id, (t.i - 1) // 7 AS sent, (t.i - 1) % 7 AS pos, words[t.i] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |       UNNEST(generate_series(1, len(words))) AS t(i)),
       |tagged AS (SELECT doc_id, sent, pos, w, $posCase AS tag FROM w),
       |emit AS (
       |  SELECT w, tag,
       |    (COUNT(*) * 1000000) // (SUM(COUNT(*)) OVER (PARTITION BY tag)) AS emit_e6
       |  FROM tagged GROUP BY w, tag),
       |tri AS (
       |  SELECT COALESCE(lag(tag, 2) OVER sw, '^') AS t1,
       |    COALESCE(lag(tag, 1) OVER sw, '^') AS t2, tag AS t3
       |  FROM tagged WINDOW sw AS (PARTITION BY doc_id, sent ORDER BY pos)),
       |trans AS (
       |  SELECT t1, t2, t3,
       |    (COUNT(*) * 1000000) // (SUM(COUNT(*)) OVER (PARTITION BY t1, t2)) AS trans_e6
       |  FROM tri GROUP BY t1, t2, t3),
       |tags AS (SELECT DISTINCT tag FROM tagged),
       |slen AS (SELECT doc_id, sent, COUNT(*) AS n FROM tagged GROUP BY 1, 2),
       |paths(doc_id, sent, pos, a, b, score, path) AS (
       |  SELECT g.doc_id, g.sent, 0, '^', t.tag,
       |    COALESCE(tr.trans_e6, 0) + COALESCE(e.emit_e6, 0), t.tag
       |  FROM tagged g CROSS JOIN tags t
       |  LEFT JOIN trans tr ON tr.t1 = '^' AND tr.t2 = '^' AND tr.t3 = t.tag
       |  LEFT JOIN emit e ON e.w = g.w AND e.tag = t.tag
       |  WHERE g.pos = 0
       |  UNION ALL
       |  SELECT p.doc_id, p.sent, p.pos + 1, p.b, t.tag,
       |    p.score + COALESCE(tr.trans_e6, 0) + COALESCE(e.emit_e6, 0),
       |    p.path || ' ' || t.tag
       |  FROM paths p
       |  JOIN tagged g ON g.doc_id = p.doc_id AND g.sent = p.sent AND g.pos = p.pos + 1
       |  CROSS JOIN tags t
       |  LEFT JOIN trans tr ON tr.t1 = p.a AND tr.t2 = p.b AND tr.t3 = t.tag
       |  LEFT JOIN emit e ON e.w = g.w AND e.tag = t.tag),
       |best AS (
       |  SELECT p.doc_id, p.sent, s.n AS n_words, p.path AS tags, p.score AS score_e6,
       |    row_number() OVER (PARTITION BY p.doc_id, p.sent
       |      ORDER BY p.score DESC, p.path ASC) AS rn
       |  FROM paths p JOIN slen s ON s.doc_id = p.doc_id AND s.sent = p.sent
       |    AND p.pos = s.n - 1),
       |rulestr AS (
       |  SELECT doc_id, sent, string_agg(tag, ' ' ORDER BY pos) AS rule_tags
       |  FROM tagged GROUP BY 1, 2)
       |SELECT b.doc_id, CAST(b.sent AS BIGINT) AS sent,
       |  CAST(b.n_words AS INTEGER) AS n_words, b.tags,
       |  CAST(b.score_e6 AS BIGINT) AS score_e6, r.rule_tags,
       |  (b.tags = r.rule_tags) AS is_match
       |FROM best b JOIN rulestr r USING (doc_id, sent)
       |WHERE b.rn = 1 ORDER BY b.doc_id, b.sent""".stripMargin
  }

  /** Q102 — small-file COMPACTION planning, the warehouse-maintenance
    * pass every large table needs (thousands of small files → scan
    * overhead; the fix is periodic bin-packed rewrites): a REAL file
    * listing (binaryFile over the q29 fixture tree) is packed into
    * target-size rewrite bins by cumulative size in stable name order —
    * the same first-fit-by-offset discipline as token packing (q36),
    * applied to bytes. Per-directory bins, so at scale each partition
    * directory plans independently. The oracle recomputes every file's
    * size closed-form from the generating table (the q29 move) and
    * replays the cumulative binning. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val fx = DirectoryIngest.ensureFixture(spark, dir, modulo = 10)
    // the bin block is the file's PARENT DIRECTORY read off the path — a
    // real column (a literal here would constant-fold out of the window's
    // partition spec and plan a single-task global pack); the fixture
    // tree is one flat dir, a partitioned warehouse table bins per
    // partition directory independently
    val files = DirectoryIngest.scan(spark, fx)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.txt$", 1).cast("long").as("id"),
        regexp_extract(col("path"), "^(.*)/[^/]*$", 1).as("dir"),
        col("length").as("n_bytes"))
    graft.ops.TrainingPrep.packByTokens(files, "dir", "id", "n_bytes",
        budget = 4096L)
      .select(col("id"), col("n_bytes"), col("pack_id").as("bin_id"))
      .orderBy(col("id"))
  }

  val compactionPlanSql: String =
    """SELECT id, n_bytes, CAST((cum - n_bytes) // 4096 AS BIGINT) AS bin_id
      |FROM (
      |  SELECT doc_id AS id,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |    SUM(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)) OVER (
      |      ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents WHERE doc_id % 10 = 0)
      |ORDER BY id""".stripMargin

  /** Q157 — URL-level crawl curation (ops/UrlOps.scala): canonicalization
    * → URL dedup → registrable-domain extraction → per-domain cap, the
    * step a web-scale pipeline runs BEFORE text dedup (RefinedWeb §3.1;
    * the reference keys records on the ingest URI —
    * KafkaIntelligencePipeline.kt:304-341 — which only collides correctly
    * once normalized). Each document synthesizes one deterministic crawl
    * URL; doc pairs (2k, 2k+1) name the SAME page through two different
    * surface forms drawn from four variants that jointly exercise every
    * canonicalization rule: mixed-case scheme/host, default :80 port,
    * `www.` label, trailing slash, fragment, `utm_*` tracking params, and
    * shuffled query-param order. Collapse is a hash agg on the canonical
    * form (no window); the per-domain cap is WindowGroupLimit-planned
    * top-5 by (best_chars desc, canon asc). The census pins not just the
    * counts but WHICH pages survived the cap (kept_pages_sum — an
    * order-sensitive checksum of the selection). The oracle replays the
    * identical canonicalization algebra in DuckDB (regexp + list
    * functions), so the convention itself is hash-pinned. */
  /** The deterministic messy-frontier synthesis shared by q157 and q172:
    * each doc contributes one of four surface forms of its page URL
    * (case/WWW/port/param-order/utm/fragment variation — two docs per
    * canonical page, 37 sites). Mirrored CTE-for-CTE by
    * [[urlCanonCtes]]. */
  private def syntheticFrontier(docs: DataFrame): DataFrame = {
    val page = expr("doc_id div 2")
    val site = page % 37
    val p = page.cast("string")
    val s = site.cast("string")
    docs.select(col("doc_id"), col("n_chars"), page.as("page"),
      when(pmod(col("doc_id"), lit(4)) === 0, concat(
          lit("HTTP://WWW.Crawl.Site"), s, lit(".COM:80/page/"), p, lit("/?b=2&a=1")))
        .when(pmod(col("doc_id"), lit(4)) === 1, concat(
          lit("http://crawl.site"), s, lit(".com/page/"), p, lit("?a=1&b=2#frag")))
        .when(pmod(col("doc_id"), lit(4)) === 2, concat(
          lit("http://www.crawl.site"), s, lit(".com/page/"), p,
          lit("?utm_source=feed&utm_campaign=x&b=2&a=1")))
        .otherwise(concat(
          lit("http://crawl.site"), s, lit(".com:80/page/"), p, lit("/?b=2&a=1")))
        .as("url"))
  }

  /** Q213 — POLITENESS-AWARE fetch scheduling: the crawl-side operator
    * between the frontier and the fetchers. Canonical URLs collapse
    * (q157's chain), each HOST's queue is ordered by priority
    * (best_chars desc, canon asc — the recrawl-value convention) into
    * per-host sequence numbers (one request per host per round — the
    * politeness constraint every real crawler serializes on), and hosts
    * are hash-assigned to a fixed pool of fetcher slots (portableHash60
    * — engine-replayable, so the oracle reproduces the exact
    * assignment). The census prices the schedule per slot: host count,
    * URL load, deepest host queue (the politeness-bound lower limit on
    * rounds), and the integer lower bound on rounds-to-drain
    * max(deepest queue, ceil(urls/hosts)) — the number a crawl capacity
    * plan needs before provisioning fetchers.
    *
    * Scale: one canonical hash-agg collapse, one HOST-partitioned rank
    * (bounded by per-host queue length, never a global window), one
    * 8-key census. Hosts are the exchange key; URLs never shuffle
    * twice. */
  def politenessSchedule(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    import org.apache.spark.sql.expressions.Window
    val urls = syntheticFrontier(Tables.documents(spark, dir))
    val perCanon = urls
      .select(UrlOps.canonicalizeUrl(col("url")).as("canon"), col("n_chars"))
      .groupBy(col("canon")).agg(max(col("n_chars")).as("pri"))
      // canonical forms are fixed points of canonicalization (the
      // UrlOpsSpec idempotence property), so urlHost on canon is the
      // plain authority extraction
      .withColumn("host", UrlOps.urlHost(col("canon")))
    perCanon
      .withColumn("seq", row_number().over(Window.partitionBy(col("host"))
        .orderBy(col("pri").desc, col("canon").asc)))
      .withColumn("slot",
        pmod(graft.functions.TextFunctions.portableHash60(col("host")), lit(8L)))
      .groupBy(col("slot"))
      .agg(count_distinct(col("host")).as("n_hosts"),
        count(lit(1)).as("n_urls"),
        max(col("seq")).cast("long").as("max_host_depth"),
        greatest(max(col("seq")).cast("long"),
          expr("(count(1) + count(DISTINCT host) - 1) div count(DISTINCT host)"))
          .as("min_rounds"))
      .orderBy(col("slot"))
  }

  // def, not val: urlCanonCtes is declared further down the object and
  // would still be null during this field's initializer
  def politenessScheduleSql: String =
    "WITH " + urlCanonCtes + """,
      |per_canon AS (
      |  SELECT canon, CAST(max(n_chars) AS BIGINT) AS pri FROM canon GROUP BY canon),
      |hosted AS (
      |  SELECT canon, pri,
      |    regexp_extract(canon, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS host
      |  FROM per_canon),
      |seqd AS (
      |  SELECT host, canon,
      |    row_number() OVER (PARTITION BY host ORDER BY pri DESC, canon) AS seq,
      |    CAST(('0x' || substring(md5(host), 1, 15)) AS BIGINT) % 8 AS slot
      |  FROM hosted)
      |SELECT slot, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
      |  CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(max(seq) AS BIGINT) AS max_host_depth,
      |  CAST(greatest(max(seq),
      |    (count(*) + count(DISTINCT host) - 1) // count(DISTINCT host)) AS BIGINT)
      |    AS min_rounds
      |FROM seqd GROUP BY slot ORDER BY slot""".stripMargin

  def urlCuration(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    val urls = syntheticFrontier(Tables.documents(spark, dir))
    // canonical collapse: hash agg, not a window — page and domain are
    // constant within a canonical group, so max() reads them off
    val perCanon = urls
      .select(col("n_chars"), col("page"),
        UrlOps.canonicalizeUrl(col("url")).as("canon"),
        UrlOps.registrableDomain(UrlOps.urlHost(col("url"))).as("domain"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_urls"), max(col("n_chars")).as("best_chars"),
        max(col("page")).as("page"), max(col("domain")).as("domain"))
      .localCheckpoint(true) // eager: two consumers (census + cap)
    val kept = UrlOps.capPerDomain(perCanon, "domain",
      Seq(col("best_chars").desc, col("canon").asc), cap = 5)
    val census = perCanon.groupBy(col("domain"))
      .agg(sum(col("n_urls")).as("n_urls"), count(lit(1)).as("n_canonical"))
    val keptAgg = kept.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_kept"), sum(col("best_chars")).as("kept_chars"),
        sum(col("page")).as("kept_pages_sum"))
    census.join(keptAgg, Seq("domain"))
      .select(col("domain"), col("n_urls"), col("n_canonical"), col("n_kept"),
        col("kept_chars"), col("kept_pages_sum"))
      .orderBy(col("domain"))
  }

  /** The q157 frontier-synthesis + canonicalization CTE chain
    * (urls → parts → norm → canon), shared with q172's robots gate so
    * the two URL pipelines replay identical canonical forms. */
  private val urlCanonCtes: String =
    """urls AS (
      |  SELECT doc_id, n_chars, doc_id // 2 AS page,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN 'HTTP://WWW.Crawl.Site' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |        || '.COM:80/page/' || CAST(doc_id // 2 AS VARCHAR) || '/?b=2&a=1'
      |      WHEN 1 THEN 'http://crawl.site' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |        || '.com/page/' || CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2#frag'
      |      WHEN 2 THEN 'http://www.crawl.site' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |        || '.com/page/' || CAST(doc_id // 2 AS VARCHAR)
      |        || '?utm_source=feed&utm_campaign=x&b=2&a=1'
      |      ELSE 'http://crawl.site' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |        || '.com:80/page/' || CAST(doc_id // 2 AS VARCHAR) || '/?b=2&a=1'
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, n_chars, page, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS rawhost,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |    regexp_extract(url, '\?([^#]*)', 1) AS rawq
      |  FROM urls),
      |norm AS (
      |  SELECT doc_id, n_chars, page,
      |    regexp_replace(
      |      CASE WHEN scheme = 'http' THEN regexp_replace(rawhost, ':80$', '')
      |           WHEN scheme = 'https' THEN regexp_replace(rawhost, ':443$', '')
      |           ELSE rawhost END, '^(www\.)+', '') AS host,
      |    scheme,
      |    CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
      |         ELSE regexp_replace(rawpath, '/+$', '') END AS path,
      |    array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |      p -> len(p) > 0 AND p NOT LIKE 'utm_%')), '&') AS q
      |  FROM parts),
      |canon AS (
      |  SELECT doc_id, n_chars, page, path,
      |    scheme || '://' || host || path ||
      |      CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon,
      |    CASE WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) = '' THEN host
      |         ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS domain
      |  FROM norm)""".stripMargin

  // concatenated, NOT interpolated under one stripMargin: the CTE block
  // contains continuation lines that START with the `||` operator, and an
  // outer stripMargin would eat their first pipe
  val urlCurationSql: String =
    s"WITH $urlCanonCtes,\n" +
    """per_canon AS (
      |  SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_urls,
      |    MAX(n_chars) AS best_chars, MAX(page) AS page, MAX(domain) AS domain
      |  FROM canon GROUP BY canon),
      |kept AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY domain
      |      ORDER BY best_chars DESC, canon ASC) AS rn
      |    FROM per_canon) WHERE rn <= 5),
      |census AS (
      |  SELECT domain, CAST(SUM(n_urls) AS BIGINT) AS n_urls,
      |    CAST(COUNT(*) AS BIGINT) AS n_canonical
      |  FROM per_canon GROUP BY domain),
      |kept_agg AS (
      |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    CAST(SUM(best_chars) AS BIGINT) AS kept_chars,
      |    CAST(SUM(page) AS BIGINT) AS kept_pages_sum
      |  FROM kept GROUP BY domain)
      |SELECT domain, n_urls, n_canonical, n_kept, kept_chars, kept_pages_sum
      |FROM census JOIN kept_agg USING (domain)
      |ORDER BY domain""".stripMargin

  /** Q172 — ROBOTS-EXCLUSION COMPLIANCE gate (RFC 9309, the legal/
    * politeness filter every crawl pipeline runs between frontier and
    * fetch): the messy frontier canonicalizes (q157's shared chain),
    * collapses to canonical pages, and each page is judged against its
    * domain's parsed robots rules — here a deterministic bounded rule
    * table (block-all for site ≡ 0 mod 11, the RFC's PREFIX-match
    * `Disallow: /page/1` for site ≡ 0 mod 3, crawl-delay 10 s for
    * site ≡ 0 mod 5; in production this table is the parsed robots.txt
    * store, same shape). Output per domain: url/page volumes, verdict
    * counts, the crawl delay, and the allowed share — the fetch-budget
    * table a scheduler consumes next to q161's recrawl rates.
    *
    * Scale: rules are a bounded per-domain table (broadcast in
    * production); the only exchanges are the canonical collapse (the
    * q157-audited hash agg) and the bounded domain census. Prefix
    * matching is a row-local starts_with — no per-rule explode. */
  def robotsCompliance(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    val urls = syntheticFrontier(Tables.documents(spark, dir))
    val perCanon = urls
      .select(col("page"),
        UrlOps.canonicalizeUrl(col("url")).as("canon"),
        UrlOps.urlPath(col("url")).as("path"),
        UrlOps.registrableDomain(UrlOps.urlHost(col("url"))).as("domain"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_urls"), max(col("page")).as("page"),
        max(col("path")).as("path"), max(col("domain")).as("domain"))
    judgedCensus(perCanon)
  }

  private def judgedCensus(perCanon: DataFrame): DataFrame =
    perCanon
      .withColumn("site", pmod(col("page"), lit(37)))
      .withColumn("verdict",
        when(col("site") % 11 === 0, lit("blocked_all"))
          .when(col("site") % 3 === 0 && col("path").startsWith("/page/1"),
            lit("blocked_prefix"))
          .otherwise(lit("allowed")))
      .withColumn("crawl_delay_s",
        when(col("site") % 5 === 0, lit(10L)).otherwise(lit(0L)))
      .groupBy(col("domain"))
      .agg(sum(col("n_urls")).as("n_urls"),
        count(lit(1)).as("n_pages"),
        sum(when(col("verdict") === "blocked_all", 1L).otherwise(0L))
          .as("n_blocked_all"),
        sum(when(col("verdict") === "blocked_prefix", 1L).otherwise(0L))
          .as("n_blocked_prefix"),
        sum(when(col("verdict") === "allowed", 1L).otherwise(0L)).as("n_allowed"),
        max(col("crawl_delay_s")).as("crawl_delay_s"))
      .withColumn("allowed_share_micro",
        expr("CAST(n_allowed * 1000000 DIV n_pages AS BIGINT)"))
      .orderBy(col("domain"))

  val robotsComplianceSql: String =
    s"WITH $urlCanonCtes,\n" +
    """per_canon AS (
       |  SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_urls, MAX(page) AS page,
       |    MAX(path) AS path, MAX(domain) AS domain
       |  FROM canon GROUP BY canon),
       |judged AS (
       |  SELECT *,
       |    CASE WHEN page % 37 % 11 = 0 THEN 'blocked_all'
       |         WHEN page % 37 % 3 = 0 AND starts_with(path, '/page/1')
       |           THEN 'blocked_prefix'
       |         ELSE 'allowed' END AS verdict,
       |    CASE WHEN page % 37 % 5 = 0 THEN 10 ELSE 0 END AS crawl_delay_s
       |  FROM per_canon)
       |SELECT domain,
       |  CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       |  CAST(COUNT(*) AS BIGINT) AS n_pages,
       |  CAST(SUM(CASE WHEN verdict = 'blocked_all' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_blocked_all,
       |  CAST(SUM(CASE WHEN verdict = 'blocked_prefix' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_blocked_prefix,
       |  CAST(SUM(CASE WHEN verdict = 'allowed' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_allowed,
       |  CAST(MAX(crawl_delay_s) AS BIGINT) AS crawl_delay_s,
       |  CAST(SUM(CASE WHEN verdict = 'allowed' THEN 1 ELSE 0 END) * 1000000
       |       // COUNT(*) AS BIGINT) AS allowed_share_micro
       |FROM judged GROUP BY domain ORDER BY domain""".stripMargin

  /** Q161 — RECRAWL SCHEDULING policy (Cho & Garcia-Molina, "The
    * Evolution of the Web and Implications for an Incremental Crawler",
    * VLDB 2000): estimate each page's change rate from its content
    * digests across k crawl snapshots, then assign a crawl frequency —
    * the third leg of the crawl-economics set (frontier = discovery,
    * q156 = churn census, this = scheduling). The synthesis plants a
    * change PERIOD per page (1 + doc_id % 4 snapshots between content
    * epochs), the operator sees only digests: per page, count
    * digest≠lag(digest) over the 4 snapshots (page-partitioned window),
    * rate = changes·10⁶ div 3, policy daily ≥ ⅔, weekly ≥ ⅓, else
    * monthly. Census per (domain, policy) with the integer mean rate —
    * the table a crawl scheduler allocates fetch budget from. */
  def recrawlPolicy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pages = Tables.documents(spark, dir).select(col("doc_id"),
      expr("doc_id % 37").as("site"), expr("1 + doc_id % 4").as("period"))
    val snaps = pages
      .withColumn("s", explode(sequence(lit(0), lit(3))))
      .withColumn("digest", md5(concat(col("doc_id").cast("string"), lit(":"),
        expr("s div period").cast("string")).cast("binary")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val rates = snaps
      .withColumn("prev", lag(col("digest"), 1).over(w))
      .groupBy(col("doc_id"), col("site"))
      .agg(sum(when(col("prev").isNotNull && col("digest") =!= col("prev"), 1L)
        .otherwise(0L)).as("n_changes"))
      .withColumn("rate_micro", expr("n_changes * 1000000 div 3"))
      .withColumn("policy",
        when(col("rate_micro") >= 666667L, "daily")
          .when(col("rate_micro") >= 333333L, "weekly")
          .otherwise("monthly"))
    rates
      .groupBy(concat(lit("site"), col("site").cast("string"), lit(".com"))
        .as("domain"), col("policy"))
      .agg(count(lit(1)).as("n_pages"),
        expr("sum(rate_micro) div count(1)").as("mean_rate_micro"))
      .orderBy(col("domain"), col("policy"))
  }

  val recrawlPolicySql: String =
    """WITH pages AS (
      |  SELECT doc_id, doc_id % 37 AS site, 1 + doc_id % 4 AS period
      |  FROM documents),
      |snaps AS (
      |  SELECT doc_id, site, t.s AS s,
      |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(t.s // period AS VARCHAR)) AS digest
      |  FROM pages, UNNEST(range(0, 4)) AS t(s)),
      |lagged AS (
      |  SELECT doc_id, site, digest,
      |    lag(digest) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      |  FROM snaps),
      |rates AS (
      |  SELECT doc_id, site,
      |    SUM(CASE WHEN prev IS NOT NULL AND digest != prev THEN 1 ELSE 0 END)
      |      * 1000000 // 3 AS rate_micro
      |  FROM lagged GROUP BY 1, 2)
      |SELECT 'site' || CAST(site AS VARCHAR) || '.com' AS domain,
      |  CASE WHEN rate_micro >= 666667 THEN 'daily'
      |       WHEN rate_micro >= 333333 THEN 'weekly'
      |       ELSE 'monthly' END AS policy,
      |  CAST(COUNT(*) AS BIGINT) AS n_pages,
      |  CAST(SUM(rate_micro) // COUNT(*) AS BIGINT) AS mean_rate_micro
      |FROM rates GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q159 — DOMAIN-level curation verdict (RefinedWeb §3.1's
    * domain-level filtering, the aggregate companion of q157's URL-level
    * pass): real pipelines drop WHOLE domains — spam farms, mirror
    * hosts, boilerplate mills — from aggregate signals before touching
    * individual documents, because a domain verdict costs one bounded
    * census row while a doc verdict costs a scan per epoch. Signals per
    * registrable domain: URL-duplication rate (mirror/alias density —
    * the synthesis assigns each site a duplication factor g = 1+site%4,
    * so the 37 domains exercise four distinct dup regimes) and mean
    * heuristic quality (q17's kernel, exact integer micro-mean). Verdict
    * thresholds: dup ≥ 700000µ → drop (alias farms), ≥ 600000µ →
    * review, else keep. One hash aggregation over the corpus (domain is
    * derived map-side by the q157 column algebra); 37 rows out. */
  def domainCuration(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, dir)
    // integer algebra only (expr's div): Column./ is double division
    val site = expr("(doc_id div 100) % 37")
    val page = expr("(doc_id % 100) div (((doc_id div 100) % 37) % 4 + 1)")
    val url = concat(lit("http://site"), site.cast("string"), lit(".com/p/"),
      page.cast("string"))
    val perDoc = docs.select(
      UrlOps.canonicalizeUrl(url).as("canon"),
      UrlOps.registrableDomain(UrlOps.urlHost(url)).as("domain"),
      round(TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
        .cast("long").as("q_micro"))
    perDoc.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_pages"),
        expr("sum(q_micro) div count(1)").as("quality_micro"))
      .withColumn("dup_micro",
        expr("(n_docs - n_pages) * 1000000 div n_docs"))
      .withColumn("verdict",
        when(col("dup_micro") >= 700000L, "drop")
          .when(col("dup_micro") >= 600000L, "review")
          .otherwise("keep"))
      .select(col("domain"), col("n_docs"), col("n_pages"),
        col("dup_micro"), col("quality_micro"), col("verdict"))
      .orderBy(col("domain"))
  }

  val domainCurationSql: String =
    """WITH per_doc AS (
      |  SELECT
      |    'site' || CAST((doc_id // 100) % 37 AS VARCHAR) || '.com' AS domain,
      |    'http://site' || CAST((doc_id // 100) % 37 AS VARCHAR) || '.com/p/'
      |      || CAST((doc_id % 100) // (((doc_id // 100) % 37) % 4 + 1) AS VARCHAR) AS canon,
      |    CAST(round((0.3 * least(1.0, n / 50)
      |        + 0.3 * (nd / n)
      |        + 0.2 * (1.0 - dig / n)
      |        + 0.2 * least(1.0, ((length(text) - (n - 1)) / n) / 8)) * 1000000, 0) AS BIGINT) AS q_micro
      |  FROM (
      |    SELECT doc_id, text,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |      CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) AS dig
      |    FROM documents)),
      |census AS (
      |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_pages,
      |    CAST(SUM(q_micro) // COUNT(*) AS BIGINT) AS quality_micro
      |  FROM per_doc GROUP BY domain)
      |SELECT domain, n_docs, n_pages,
      |  CAST((n_docs - n_pages) * 1000000 // n_docs AS BIGINT) AS dup_micro,
      |  quality_micro,
      |  CASE WHEN (n_docs - n_pages) * 1000000 // n_docs >= 700000 THEN 'drop'
      |       WHEN (n_docs - n_pages) * 1000000 // n_docs >= 600000 THEN 'review'
      |       ELSE 'keep' END AS verdict
      |FROM census ORDER BY domain""".stripMargin

  /** Q180 — PSL-aware registrable-domain extraction
    * ([[graft.ops.UrlOps.withRegistrableDomain]]): the two-label default
    * over-merges `*.co.uk`-class hosts into one per-domain cap bucket, so
    * the extractor accepts an optional bounded public-suffix table
    * (broadcast). This query runs BOTH modes side by side over a
    * synthetic host population that exercises every rule: 2-label
    * suffix (`shopN.co.uk` → 3-label registrable), 3-label suffix with
    * longest-match precedence over its embedded 2-label one
    * (`meN.blogspot.co.uk` → 4-label registrable), implicit 1-label
    * suffix (`siteN.example.com` → default), a bare-suffix host
    * (`co.uk` → itself), and a dotless host. The census pins the full
    * default↔PSL mapping (n_hosts + first_doc per pair); the oracle
    * replays the candidate extraction, both broadcast joins, and the
    * longest-match ladder. Default-mode consumers (q157/q159/q172) are
    * untouched — their hashes pin that the parameterization changed
    * nothing when no table is supplied. */
  def registrableSuffix(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    val hosts = Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 57 === 0, lit("co.uk"))
        .when(col("doc_id") % 41 === 0, lit("localhost"))
        .when(col("doc_id") % 3 === 0,
          concat(lit("shop"), (col("doc_id") % 23).cast("string"), lit(".co.uk")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("me"), (col("doc_id") % 23).cast("string"), lit(".blogspot.co.uk")))
        .otherwise(
          concat(lit("site"), (col("doc_id") % 23).cast("string"), lit(".example.com")))
        .as("host"))
    import spark.implicits._
    val suffixes = Seq("co.uk", "com.au", "blogspot.co.uk").toDF("suffix")
    val both = UrlOps.withRegistrableDomain(
      UrlOps.withRegistrableDomain(hosts, "host", "domain_default", None),
      "host", "domain_psl", Some(suffixes))
    both.groupBy(col("domain_psl"), col("domain_default"))
      .agg(count(lit(1)).as("n_hosts"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("domain_psl"), col("domain_default"))
  }

  val registrableSuffixSql: String =
    """WITH hosts AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 57 = 0 THEN 'co.uk'
      |         WHEN doc_id % 41 = 0 THEN 'localhost'
      |         WHEN doc_id % 3 = 0 THEN 'shop' || CAST(doc_id % 23 AS VARCHAR) || '.co.uk'
      |         WHEN doc_id % 3 = 1 THEN 'me' || CAST(doc_id % 23 AS VARCHAR) || '.blogspot.co.uk'
      |         ELSE 'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.com' END AS host
      |  FROM documents),
      |suf AS (SELECT * FROM (VALUES ('co.uk'), ('com.au'), ('blogspot.co.uk')) s(suffix)),
      |s3 AS (SELECT suffix FROM suf WHERE len(string_split(suffix, '.')) = 3),
      |s2 AS (SELECT suffix FROM suf WHERE len(string_split(suffix, '.')) = 2),
      |cand AS (
      |  SELECT doc_id, host,
      |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS c2,
      |    regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1) AS c3,
      |    regexp_extract(host, '([^.]+\.[^.]+\.[^.]+\.[^.]+)$', 1) AS r4
      |  FROM hosts),
      |j AS (
      |  SELECT cand.*, s3.suffix AS m3, s2.suffix AS m2
      |  FROM cand LEFT JOIN s3 ON cand.c3 = s3.suffix
      |            LEFT JOIN s2 ON cand.c2 = s2.suffix),
      |modes AS (
      |  SELECT doc_id, host,
      |    CASE WHEN c2 = '' THEN host ELSE c2 END AS domain_default,
      |    CASE WHEN m3 IS NOT NULL THEN (CASE WHEN r4 = '' THEN host ELSE r4 END)
      |         WHEN m2 IS NOT NULL THEN (CASE WHEN c3 = '' THEN host ELSE c3 END)
      |         ELSE (CASE WHEN c2 = '' THEN host ELSE c2 END) END AS domain_psl
      |  FROM j)
      |SELECT domain_psl, domain_default,
      |  CAST(COUNT(*) AS BIGINT) AS n_hosts,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM modes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q185 — crawl IDENTITY MATRIX: the (canonical URL × content digest)
    * cross that separates the three ways a crawl re-encounters content —
    * RE-FETCH (same page, same bytes: a true duplicate the URL gate
    * should have caught), UPDATE (same page, new bytes: feed the
    * recrawl scheduler, not the dedup), and MIRROR / syndication
    * (different pages, same bytes: content-level dedup territory, and
    * the thing URL dedup is structurally blind to). Every
    * crawl-governance decision routes on this distinction; conflating
    * them either re-crawls nothing or dedups away legitimate updates.
    * Planted signal: every doc_id % 6 == 0 page re-fetched verbatim
    * (+20M ids), every % 6 == 1 page mirrored byte-identically under a
    * different site (+30M), every % 6 == 3 page updated in place
    * (+40M, same URL, new text). One census row; the oracle replays
    * canonicalization, digests, and all three group censuses.
    *
    * Scale: two hash aggregates keyed on canon / digest (fixed-width
    * md5 exchange keys, the q87 lesson) over one synthesized pass —
    * no joins, no windows. */
  def identityMatrix(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        concat(lit("http://site"), (expr("doc_id div 2") % 37).cast("string"),
          lit(".com/page/"), col("doc_id").cast("string")).as("url"))
    val refetch = base.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"), col("url"))
    val mirror = base.filter(col("doc_id") % 6 === 1)
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"),
        concat(lit("http://mirror"), (expr("doc_id div 2") % 37).cast("string"),
          lit(".net/page/"), col("doc_id").cast("string")).as("url"))
    val update = base.filter(col("doc_id") % 6 === 3)
      .select((col("doc_id") + 40000000L).as("doc_id"),
        concat(col("text"), lit(" rev2")).as("text"), col("url"))
    val all = base.unionByName(refetch).unionByName(mirror).unionByName(update)
      .select(graft.ops.UrlOps.canonicalizeUrl(col("url")).as("canon"),
        md5(col("text").cast("binary")).as("digest"))
      .localCheckpoint(true) // three censuses read it
    val pages = all.groupBy(col("canon"))
      .agg(countDistinct(col("digest")).as("nd"), count(lit(1)).as("n"))
    val contents = all.groupBy(col("digest"))
      .agg(countDistinct(col("canon")).as("nc"))
    val exact = all.groupBy(col("canon"), col("digest"))
      .agg(count(lit(1)).as("n"))
    all.agg(count(lit(1)).as("n_docs"))
      .crossJoin(pages.agg(
        count(lit(1)).as("n_pages"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_updated_pages")))
      .crossJoin(contents.agg(
        count(lit(1)).as("n_contents"),
        sum(when(col("nc") > 1, 1L).otherwise(0L)).as("n_mirrored_contents")))
      .crossJoin(exact.agg(
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("n_refetch_dups")))
      .select(col("n_docs"), col("n_pages"), col("n_updated_pages"),
        col("n_contents"), col("n_mirrored_contents"), col("n_refetch_dups"))
  }

  val identityMatrixSql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    'http://site' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |      || '.com/page/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |allrows AS (
      |  SELECT url, md5(text) AS digest FROM base
      |  UNION ALL
      |  SELECT url, md5(text) FROM base WHERE doc_id % 6 = 0
      |  UNION ALL
      |  SELECT 'http://mirror' || CAST((doc_id // 2) % 37 AS VARCHAR)
      |    || '.net/page/' || CAST(doc_id AS VARCHAR), md5(text)
      |  FROM base WHERE doc_id % 6 = 1
      |  UNION ALL
      |  SELECT url, md5(text || ' rev2') FROM base WHERE doc_id % 6 = 3),
      |canond AS (
      |  SELECT lower(url) AS canon, digest FROM allrows),
      |pages AS (
      |  SELECT canon, COUNT(DISTINCT digest) AS nd, COUNT(*) AS n
      |  FROM canond GROUP BY 1),
      |contents AS (
      |  SELECT digest, COUNT(DISTINCT canon) AS nc FROM canond GROUP BY 1),
      |exact AS (
      |  SELECT canon, digest, COUNT(*) AS n FROM canond GROUP BY 1, 2)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM canond) AS BIGINT) AS n_docs,
      |  CAST((SELECT COUNT(*) FROM pages) AS BIGINT) AS n_pages,
      |  CAST((SELECT SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) FROM pages) AS BIGINT) AS n_updated_pages,
      |  CAST((SELECT COUNT(*) FROM contents) AS BIGINT) AS n_contents,
      |  CAST((SELECT SUM(CASE WHEN nc > 1 THEN 1 ELSE 0 END) FROM contents) AS BIGINT) AS n_mirrored_contents,
      |  CAST((SELECT SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) FROM exact) AS BIGINT) AS n_refetch_dups""".stripMargin

  /** Q187 — domain-level QUALITY PARETO: which domains carry the
    * corpus's low-quality mass (the artifact behind RefinedWeb-style
    * per-domain caps and blocklists — a handful of template-farm
    * domains usually owns most of the junk, and capping THEM beats
    * filtering doc-by-doc). Per registrable domain (the q157 synthetic
    * site map): volume (docs, tokens), mean q17 quality (integer div),
    * and the QUALITY DEFICIT — the total µ-mass below the 0.5 quality
    * line, i.e. what a keep≥0.5 gate would discard from this domain.
    * Reading the table sorted by deficit IS the blocklist-candidate
    * review. One map-only scoring pass + a 37-key hash aggregate. */
  def domainPareto(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(
        concat(lit("site"), (expr("doc_id div 2") % 37).cast("string"),
          lit(".com")).as("domain"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        round(graft.functions.TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
          .cast("long").as("qm"))
    scored.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("qm")).as("__qs"),
        sum(when(col("qm") < 500000L, lit(500000L) - col("qm")).otherwise(0L))
          .as("deficit_micro"),
        sum(when(col("qm") < 500000L, 1L).otherwise(0L)).as("n_below"))
      .withColumn("mean_qm", expr("__qs div n_docs"))
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("mean_qm"),
        col("n_below"), col("deficit_micro"))
      .orderBy(col("domain"))
  }

  val domainParetoSql: String =
    """WITH scored AS (
      |  SELECT 'site' || CAST((doc_id // 2) % 37 AS VARCHAR) || '.com' AS domain,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(round((0.3 * least(1.0, n / 50)
      |      + 0.3 * (nd / n)
      |      + 0.2 * (1.0 - dig / n)
      |      + 0.2 * least(1.0, ((length(text) - (n - 1)) / n) / 8)) * 1000000, 0) AS BIGINT) AS qm
      |  FROM (
      |    SELECT doc_id, text,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |      CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) AS dig
      |    FROM documents))
      |SELECT domain,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(qm) // COUNT(*) AS BIGINT) AS mean_qm,
      |  CAST(SUM(CASE WHEN qm < 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |  CAST(SUM(CASE WHEN qm < 500000 THEN 500000 - qm ELSE 0 END) AS BIGINT) AS deficit_micro
      |FROM scored GROUP BY domain ORDER BY domain""".stripMargin

  /** Q188 — URL TEMPLATE census, the crawler-TRAP detector: calendar
    * pages, session-id paths, and pagination farms all produce one path
    * TEMPLATE with disproportionate URL volume, and a crawler that
    * doesn't notice spends its fetch budget there (every production
    * crawler mines these — Heritrix's path-repetition rules, the
    * Common Crawl URL frontier's per-pattern caps). Template = the
    * canonical path with digit runs collapsed to `N` (the standard
    * normalization); census per template: distinct URLs, distinct
    * domains, volume share in µ. The planted synthesis gives four
    * shapes — a calendar trap (3-level date explosion), flat pages,
    * slug articles, and a 7-variant static set — so the share ranking
    * is exercised. Map-only normalization (codegen'd regexp) into one
    * bounded hash aggregate. */
  def urlTemplates(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.UrlOps
    val urls = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("http://site"), (expr("doc_id div 2") % 37).cast("string"),
        lit(".com"),
        when(col("doc_id") % 4 === 0, concat(lit("/cal/"),
          (col("doc_id") % 3).cast("string"), lit("/"),
          (col("doc_id") % 12).cast("string"), lit("/"),
          col("doc_id").cast("string")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("/p/"), col("doc_id").cast("string")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("/article/guide-"), col("doc_id").cast("string")))
          .otherwise(concat(lit("/faq"), (col("doc_id") % 7).cast("string"))))
        .as("url"))
    val t = urls.select(
      UrlOps.registrableDomain(UrlOps.urlHost(col("url"))).as("domain"),
      UrlOps.canonicalizeUrl(col("url")).as("canon"),
      regexp_replace(UrlOps.urlPath(col("url")), "[0-9]+", "N").as("template"))
    val total = t.agg(countDistinct(col("canon")).as("n_total"))
    t.groupBy(col("template"))
      .agg(countDistinct(col("canon")).as("n_urls"),
        countDistinct(col("domain")).as("n_domains"))
      .crossJoin(broadcast(total))
      .withColumn("share_micro", expr("n_urls * 1000000 div n_total"))
      .select(col("template"), col("n_urls"), col("n_domains"), col("share_micro"))
      .orderBy(col("template"))
  }

  val urlTemplatesSql: String =
    """WITH urls AS (
      |  SELECT doc_id,
      |    'http://site' || CAST((doc_id // 2) % 37 AS VARCHAR) || '.com' ||
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN '/cal/' || CAST(doc_id % 3 AS VARCHAR) || '/'
      |        || CAST(doc_id % 12 AS VARCHAR) || '/' || CAST(doc_id AS VARCHAR)
      |      WHEN 1 THEN '/p/' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN '/article/guide-' || CAST(doc_id AS VARCHAR)
      |      ELSE '/faq' || CAST(doc_id % 7 AS VARCHAR)
      |    END AS url
      |  FROM documents),
      |t AS (
      |  SELECT
      |    regexp_extract(lower(url), '://([^/]+)', 1) AS host,
      |    lower(url) AS canon,
      |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      |      '[0-9]+', 'N', 'g') AS template
      |  FROM urls),
      |tot AS (SELECT COUNT(DISTINCT canon) AS n_total FROM t)
      |SELECT template,
      |  CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_urls,
      |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_domains,
      |  CAST(COUNT(DISTINCT canon) * 1000000 // (SELECT n_total FROM tot) AS BIGINT) AS share_micro
      |FROM t GROUP BY template ORDER BY template""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q187_domain_pareto", domainPareto, Some(domainParetoSql)),
    QueryDef("q188_url_templates", urlTemplates, Some(urlTemplatesSql)),
    QueryDef("q185_identity_matrix", identityMatrix, Some(identityMatrixSql)),
    QueryDef("q180_registrable_suffix", registrableSuffix, Some(registrableSuffixSql)),
    QueryDef("q102_compaction_plan", compactionPlan, Some(compactionPlanSql)),
    QueryDef("q91_ner_trained", nerTrained, Some(nerTrainedSql)),
    QueryDef("q92_pos_trained", posTrained, Some(posTrainedSql)),
    QueryDef("q29_ingest_dir", ingestDir, Some(ingestDirSql)),
    QueryDef("q147_warc_ingest", warcIngest, Some(warcIngestSql)),
    QueryDef("q210_anchor_text", anchorText, Some(anchorTextSql)),
    QueryDef("q217_anchor_index", anchorIndex, Some(anchorIndexSql)),
    QueryDef("q219_host_citation", hostCitation, Some(hostCitationSql)),
    QueryDef("q213_politeness_schedule", politenessSchedule, Some(politenessScheduleSql)),
    QueryDef("q151_crawl_curation", crawlCuration, Some(crawlCurationSql)),
    QueryDef("q156_crawl_churn", crawlChurn, Some(crawlChurnSql)),
    QueryDef("q157_url_curation", urlCuration, Some(urlCurationSql)),
    QueryDef("q172_robots_compliance", robotsCompliance, Some(robotsComplianceSql)),
    QueryDef("q176_jsonl_ingest", jsonlIngest, Some(jsonlIngestSql)),
    QueryDef("q159_domain_curation", domainCuration, Some(domainCurationSql)),
    QueryDef("q161_recrawl_policy", recrawlPolicy, Some(recrawlPolicySql)),
    QueryDef("q30_chunk_commands", chunkCommands, Some(chunkCommandsSql)),
    QueryDef("q31_rendition_extract", renditionExtraction, Some(renditionExtractionSql)),
    QueryDef("q31b_dual_renditions", dualRenditions, Some(dualRenditionsSql)),
    QueryDef("q32_sentence_chunks", sentenceChunks, Some(sentenceChunksSql)),
    QueryDef("q34_parse_map", parseMap, Some(parseMapSql)),
    QueryDef("q69_binary_pipeline", binaryPipeline, Some(binaryPipelineSql)),
    QueryDef("q78_zip_pipeline", zipPipeline, Some(zipPipelineSql)),
    QueryDef("q85_pdf_pipeline", pdfPipeline, Some(pdfPipelineSql)))
}
