package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TrainingPrep
import graft.sources.Tables

/** Training-data preparation surface (q35-q37) — deterministic splits,
  * token packing, scrubbing; all exact-oracle-backed. */
object PrepQueries {

  /** Q70 — cross-document repeated-span measurement (exact-substring
    * dedup signal, TrainingPrep.repeatedSpans): the corpus plus a planted
    * shared boilerplate suffix on every 10th document — the verbatim
    * cross-document repetition (license headers, templates) that whole-doc
    * similarity misses. 5-word spans; every span of the planted suffix
    * (and any organic cross-doc repeat) counts as repeated. The oracle
    * replays the span index, the distinct-doc counting, and the exact
    * integer fraction. */
  def repeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    val withBoilerplate = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" standard graft corpus license header applies to this document")))
          .otherwise(col("text")).as("text"))
    TrainingPrep.repeatedSpans(withBoilerplate, "doc_id", "text", k = 5, minDocs = 2)
      .orderBy(col("id"))
  }

  val repeatedSpansSql: String =
    """WITH corpus AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 10 = 0
      |         THEN text || ' standard graft corpus license header applies to this document'
      |         ELSE text END AS text
      |  FROM documents),
      |ws AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
      |spans AS (
      |  SELECT id, t.i - 1 AS pos,
      |    CAST(('0x' || substring(md5(array_to_string(w[t.i:t.i+4], ' ')), 1, 15)) AS BIGINT) AS span_hash
      |  FROM ws, UNNEST(generate_series(1, len(w) - 4)) AS t(i)
      |  WHERE len(w) >= 5),
      |rep AS (
      |  SELECT span_hash FROM spans GROUP BY span_hash
      |  HAVING COUNT(DISTINCT id) >= 2),
      |per_doc AS (
      |  SELECT s.id, COUNT(*) AS n_repeated
      |  FROM spans s SEMI JOIN rep r ON s.span_hash = r.span_hash
      |  GROUP BY s.id)
      |SELECT w.id,
      |  CAST(greatest(len(w.w) - 4, 0) AS BIGINT) AS n_spans,
      |  CAST(COALESCE(p.n_repeated, 0) AS BIGINT) AS n_repeated,
      |  CAST(CASE WHEN len(w.w) - 4 > 0
      |       THEN (COALESCE(p.n_repeated, 0) * 1000000) // (len(w.w) - 4)
      |       ELSE 0 END AS BIGINT) AS repeated_micro
      |FROM ws w LEFT JOIN per_doc p ON w.id = p.id
      |ORDER BY w.id""".stripMargin

  /** Q72 — repeated-span CUTTING (TrainingPrep.cutRepeatedSpans over the
    * q70 corpus): every word covered by a cross-document repeated 5-span
    * is removed and the text rebuilt — the planted boilerplate suffix
    * must vanish from every 10th document while untouched documents
    * round-trip digest-exact. The oracle rebuilds the cleaned text
    * independently (same span index, DISTINCT covered ordinals,
    * order-preserving re-join), so cut boundaries must be exact. */
  def spanScrub(spark: SparkSession, dir: String): DataFrame = {
    val withBoilerplate = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" standard graft corpus license header applies to this document")))
          .otherwise(col("text")).as("text"))
    TrainingPrep.cutRepeatedSpans(withBoilerplate, "doc_id", "text", k = 5, minDocs = 2)
      .select(col("id"), col("n_kept"), col("n_cut"),
        md5(col("clean_text").cast("binary")).as("clean_digest"))
      .orderBy(col("id"))
  }

  val spanScrubSql: String =
    """WITH corpus AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 10 = 0
      |         THEN text || ' standard graft corpus license header applies to this document'
      |         ELSE text END AS text
      |  FROM documents),
      |ws AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
      |spans AS (
      |  SELECT id, t.i - 1 AS pos,
      |    CAST(('0x' || substring(md5(array_to_string(w[t.i:t.i+4], ' ')), 1, 15)) AS BIGINT) AS span_hash
      |  FROM ws, UNNEST(generate_series(1, len(w) - 4)) AS t(i)
      |  WHERE len(w) >= 5),
      |rep AS (
      |  SELECT span_hash FROM spans GROUP BY span_hash
      |  HAVING COUNT(DISTINCT id) >= 2),
      |covered AS (
      |  SELECT DISTINCT s.id, s.pos + t.j AS idx
      |  FROM spans s SEMI JOIN rep r ON s.span_hash = r.span_hash,
      |       UNNEST(generate_series(0, 4)) AS t(j)),
      |words AS (
      |  SELECT id, t.i - 1 AS idx, w[t.i] AS word
      |  FROM ws, UNNEST(generate_series(1, len(w))) AS t(i)),
      |kept AS (
      |  SELECT wo.id, COUNT(*) AS n_kept,
      |    string_agg(wo.word, ' ' ORDER BY wo.idx) AS clean_text
      |  FROM words wo ANTI JOIN covered c ON wo.id = c.id AND wo.idx = c.idx
      |  GROUP BY wo.id)
      |SELECT w.id,
      |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(len(w.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_cut,
      |  md5(COALESCE(k.clean_text, '')) AS clean_digest
      |FROM ws w LEFT JOIN kept k ON w.id = k.id
      |ORDER BY w.id""".stripMargin

  /** Q35 — leakage-safe dataset split: stable hash of the doc key → pct →
    * train/val/test. Membership survives resharding and appends. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TrainingPrep.splitAssign(col("doc_id")).as("split"),
        (graft.functions.TextFunctions.portableHash60(
          col("doc_id").cast("string")) % 100).as("pct"))
      .orderBy(col("doc_id"))

  val datasetSplitSql: String =
    """SELECT doc_id,
      |  CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val' ELSE 'test' END AS split,
      |  pct
      |FROM (SELECT doc_id,
      |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS pct
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Q158 — deterministic TRAINING-ORDER SHUFFLE manifest: the last step
    * before a pretraining run writes its shards is a seeded global
    * permutation of the curated corpus (epoch order must be random-like
    * but REPRODUCIBLE — resume mid-epoch, re-materialize one lost shard,
    * audit what batch k contained). Convention ([[TrainingPrep
    * .shuffleHash]]): h = hash(seed‖':'‖doc_id), shard = h mod 16,
    * position = rank of (h, doc_id) within the shard. ONE exchange (the
    * shard partition) + a shard-partitioned rank window; no global sort
    * anywhere. The manifest census pins the ENTIRE permutation, not just
    * shard sizes: order_sum = Σ position·(doc_id mod 1000003) is
    * order-sensitive (any transposition changes it), and first_doc pins
    * each shard's head. 16 bounded rows out; the oracle replays hash,
    * deal, and rank exactly. */
  def trainingShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val S = 16
    val dealt = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        TrainingPrep.shuffleHash(col("doc_id"), "epoch1").as("h"))
      .withColumn("shard", pmod(col("h"), lit(S)).cast("int"))
    val positioned = dealt.withColumn("pos", row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
    positioned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("pos") * pmod(col("doc_id"), lit(1000003L))).as("order_sum"),
        min_by(col("doc_id"), col("pos")).as("first_doc"))
      .orderBy(col("shard"))
  }

  val trainingShuffleSql: String =
    """WITH dealt AS (
      |  SELECT doc_id, n_chars,
      |    CAST(('0x' || substring(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM documents),
      |positioned AS (
      |  SELECT doc_id, n_chars, CAST(h % 16 AS INTEGER) AS shard,
      |    CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos
      |  FROM dealt)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_sum,
      |  MIN_BY(doc_id, pos) AS first_doc
      |FROM positioned GROUP BY shard ORDER BY shard""".stripMargin

  /** Q36 — token-budget packing (2048-token packs) per source block:
    * pack_id from the cumulative token stream in stable doc order. */
  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    TrainingPrep.packByTokens(toks, "source", "doc_id", "n_tokens", budget = 2048L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  val tokenPackingSql: String =
    """SELECT doc_id, source, n_tokens,
      |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id
      |FROM (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
      |      PARTITION BY source ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Q100 — the END-TO-END curation pipeline in ONE declarative plan:
    * exact content dedup (min-id per text) → CCNet paragraph dedup
    * (q87) → reference-LM quality terciles over the CLEANED text (q93)
    * → tail-bucket cut → per-source token-budget packing (q36) — the
    * Dolma/CCNet-style chain a training-data run executes, composed
    * from the individually-audited operators so Catalyst sees one
    * lineage (scan once, no materialization between stages beyond the
    * two eager checkpoints that feed multi-consumer stages). Docs
    * whose cleaned text carries no bigram evidence drop with the tail.
    * Round 12: the parquet-corpus form serves its shared stages from
    * the build-once [[CurationArtifacts]] (exact-dup winners, paragraph
    * grid, cleaned-text LM buckets — previously re-derived per query by
    * q87/q100/q125/q160), so this plan is three FileScans + the packing
    * window; the restriction lemma in [[CurationArtifacts]] makes the
    * grid-join form exactly the dedup-then-split chain. The oracle
    * replays the ENTIRE chain — dedup window, paragraph
    * first-occurrence, count tables, surprisal, tercile thresholds,
    * bucket cut, and pack ids — in a single stitched CTE chain. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val uniq = CurationArtifacts.uniqWinners(spark, dir)
    val cleaned = CurationArtifacts.paragraphGrid(spark, dir)
      .join(uniq.select(col("doc_id")), Seq("doc_id"), "left_semi")
    curationAssemble(uniq, cleaned, CurationArtifacts.lmCleanBuckets(spark, dir))
  }

  /** The q100 chain over ANY (doc_id, source, text) document set — shared
    * by q100 (the parquet corpus, via the artifact fast path above) and
    * q151 (the WARC crawl composition, ParticipantQueries.crawlCuration,
    * which computes the stages inline because its input is the live
    * crawl, not an immutable corpus directory): the chain itself is
    * source-agnostic, exactly like a production curation run. */
  def curationChain(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uniq = docs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true) // consumers: paragraph split + source re-join
    val paras = uniq
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(ws)/7.0) as int) - 1)," +
          " i -> concat_ws(' ', slice(ws, i*7 + 1, 7)))")).as(Seq("idx", "para")))
    val cleaned = graft.ops.Dedup.paragraphDedup(paras)
      .localCheckpoint(true) // consumers: LM quality (×2) + token count + output stats
    val cleanedDocs = cleaned.select(col("doc_id"), col("clean_text").as("text"))
    val buckets = TrainingPrep.lmQualityBuckets(
      cleanedDocs, cleanedDocs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    curationAssemble(uniq.select(col("doc_id"), col("source")), cleaned, buckets)
  }

  /** The tail of the curation chain — LM-tercile cut → token counts →
    * per-source packing → output stats — over the three stage frames,
    * whether they arrive as artifact FileScans (q100) or inline stages
    * (q151). */
  private def curationAssemble(uniq: DataFrame, cleaned: DataFrame,
      buckets: DataFrame): DataFrame = {
    val cleanedDocs = cleaned.select(col("doc_id"), col("clean_text").as("text"))
    val toks = buckets.filter(col("bucket") <= 2)
      .join(cleanedDocs, Seq("doc_id"))
      .join(uniq, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"), col("bucket"))
    TrainingPrep.packByTokens(toks, "source", "doc_id", "n_tokens", budget = 512L)
      .join(cleaned.select(col("doc_id"), col("n_paras"), col("n_kept")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_paras"), col("n_kept"),
        col("bucket"), col("n_tokens"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** Q160 — per-document curation DECISION LOG, the audit companion of
    * q100's census (Dolma ships exactly this as its "attributes" files:
    * for every input document, WHY it survived or died — the artifact
    * that makes a 100 TB curation run explainable, reproducible, and
    * appealable). Same stages as [[curationChain]], same public
    * operators, but the per-doc verdicts are EMITTED instead of
    * aggregated: `exact_dup` (with the canonical winner's id — the doc a
    * deduped query should be attributed to), `no_evidence` (the cleaned
    * text left <2 words, so the LM gate had nothing to judge),
    * `low_quality` (tercile 3), or `kept` (with its quality bucket).
    * Every input doc appears EXACTLY once — the union of the stages
    * partitions the corpus, which the oracle verifies by construction.
    * The synthetic corpus has no byte-identical texts, so the exact_dup
    * verdict is exercised by PLANTING a re-ingested replica shard
    * (doc_id % 50 == 0 re-registered at doc_id + 10⁶ with identical
    * text — the double-delivered-shard incident the log exists to
    * explain; the replicas must attribute to their ORIGINAL ids). */
  def curationLog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, dir)
    val docs = base.select(col("doc_id"), col("text")).unionByName(
      base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val ranked = docs.select(col("doc_id"), col("text"),
      min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast("binary")))).as("canon_doc"))
    val exact = ranked.filter(col("doc_id") =!= col("canon_doc"))
      .select(col("doc_id"), lit("exact_dup").as("verdict"), col("canon_doc"),
        lit(-1).as("bucket"))
    // the winners of the replica corpus ARE the exact-dup winners of the
    // base corpus (replicas at +10⁶ never win), so the cleaned stage and
    // its LM buckets are served from the same build-once artifacts as
    // q100 — see the restriction lemma in [[CurationArtifacts]]; only
    // the replica-corpus exact-dup window (this query's own fixture
    // semantics) stays inline
    val uniq = ranked.filter(col("doc_id") === col("canon_doc"))
      .select(col("doc_id"))
    val cleanedDocs = CurationArtifacts.paragraphGrid(spark, dir)
      .join(uniq, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("clean_text").as("text"))
    val buckets = CurationArtifacts.lmCleanBuckets(spark, dir)
    val judged = buckets.select(col("doc_id"),
      when(col("bucket") <= 2, "kept").otherwise("low_quality").as("verdict"),
      col("doc_id").as("canon_doc"), col("bucket"))
    val noEvidence = cleanedDocs
      .join(buckets.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("no_evidence").as("verdict"),
        col("doc_id").as("canon_doc"), lit(-1).as("bucket"))
    exact.unionByName(judged).unionByName(noEvidence)
      .select(col("doc_id"), col("verdict"), col("canon_doc"),
        col("bucket").cast("int").as("bucket"))
      .orderBy(col("doc_id"))
  }

  val curationLogSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0),
      |ranked AS (
      |  SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY text) AS canon_doc
      |  FROM corpus),
      |exact AS (
      |  SELECT doc_id, 'exact_dup' AS verdict, canon_doc, -1 AS bucket
      |  FROM ranked WHERE doc_id != canon_doc),
      |uniq AS (SELECT doc_id, text FROM ranked WHERE doc_id = canon_doc),
      |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM uniq),
      |p AS (
      |  SELECT doc_id, t.i AS idx,
      |    array_to_string(ws[(t.i*7)+1:(t.i+1)*7], ' ') AS para
      |  FROM w, UNNEST(range(0, CAST(ceil(len(ws)/7.0) AS BIGINT))) AS t(i)),
      |f AS (
      |  SELECT doc_id, idx, para,
      |    row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1 AS is_first
      |  FROM p),
      |cleaned AS (
      |  SELECT doc_id,
      |    COALESCE(array_to_string(list_transform(
      |      list_sort(list({'idx': idx, 'para': para}) FILTER (is_first)),
      |      s -> s.para), ' '), '') AS text
      |  FROM f GROUP BY doc_id),
      |base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM cleaned),
      |refuni AS (
      |  SELECT w1, COUNT(*) AS c1
      |  FROM (SELECT unnest(ws) AS w1 FROM base WHERE doc_id % 3 = 0) GROUP BY 1),
      |refbg AS (
      |  SELECT bg, COUNT(*) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
      |    FROM base WHERE doc_id % 3 = 0 AND len(ws) >= 2) GROUP BY 1),
      |allbg AS (
      |  SELECT doc_id, t.w1, t.w1 || ' ' || t.w2 AS bg FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS t
      |    FROM base WHERE len(ws) >= 2)),
      |perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(CASE WHEN c12 IS NULL THEN 20
      |             ELSE length(bin(c1)) - length(bin(c12)) END) AS BIGINT) AS bits_total
      |  FROM allbg LEFT JOIN refbg USING (bg) LEFT JOIN refuni USING (w1)
      |  GROUP BY doc_id),
      |avgd AS (SELECT doc_id, (bits_total * 1000000) // n_bigrams AS avg_micro FROM perdoc),
      |hist AS (SELECT avg_micro, COUNT(*) AS nv FROM avgd GROUP BY 1),
      |cumh AS (SELECT avg_micro, SUM(nv) OVER (ORDER BY avg_micro) AS cum FROM hist),
      |tot AS (SELECT COUNT(*) AS n FROM avgd),
      |thr AS (
      |  SELECT MIN(CASE WHEN cum * 3 >= n THEN avg_micro END) AS t1,
      |    MIN(CASE WHEN cum * 3 >= n * 2 THEN avg_micro END) AS t2
      |  FROM cumh, tot),
      |judged AS (
      |  SELECT a.doc_id,
      |    CASE WHEN a.avg_micro <= t.t1 THEN 'kept'
      |         WHEN a.avg_micro <= t.t2 THEN 'kept'
      |         ELSE 'low_quality' END AS verdict,
      |    a.doc_id AS canon_doc,
      |    CASE WHEN a.avg_micro <= t.t1 THEN 1 WHEN a.avg_micro <= t.t2 THEN 2
      |         ELSE 3 END AS bucket
      |  FROM avgd a, thr t),
      |noev AS (
      |  SELECT c.doc_id, 'no_evidence' AS verdict, c.doc_id AS canon_doc, -1 AS bucket
      |  FROM cleaned c LEFT JOIN avgd a USING (doc_id) WHERE a.doc_id IS NULL)
      |SELECT doc_id, verdict, canon_doc, CAST(bucket AS INTEGER) AS bucket FROM exact
      |UNION ALL SELECT doc_id, verdict, canon_doc, CAST(bucket AS INTEGER) FROM judged
      |UNION ALL SELECT doc_id, verdict, canon_doc, CAST(bucket AS INTEGER) FROM noev
      |ORDER BY doc_id""".stripMargin

  val curationPipelineSql: String =
    """WITH uniq AS (
      |  SELECT doc_id, source, text FROM (
      |    SELECT doc_id, source, text,
      |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |    FROM documents) WHERE rn = 1),
      |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM uniq),
      |p AS (
      |  SELECT doc_id, t.i AS idx,
      |    array_to_string(ws[(t.i*7)+1:(t.i+1)*7], ' ') AS para
      |  FROM w, UNNEST(range(0, CAST(ceil(len(ws)/7.0) AS BIGINT))) AS t(i)),
      |f AS (
      |  SELECT doc_id, idx, para,
      |    row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1 AS is_first
      |  FROM p),
      |cleaned AS (
      |  SELECT doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_paras,
      |    CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    COALESCE(array_to_string(list_transform(
      |      list_sort(list({'idx': idx, 'para': para}) FILTER (is_first)),
      |      s -> s.para), ' '), '') AS text
      |  FROM f GROUP BY doc_id),
      |base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM cleaned),
      |refuni AS (
      |  SELECT w1, COUNT(*) AS c1
      |  FROM (SELECT unnest(ws) AS w1 FROM base WHERE doc_id % 3 = 0) GROUP BY 1),
      |refbg AS (
      |  SELECT bg, COUNT(*) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
      |    FROM base WHERE doc_id % 3 = 0 AND len(ws) >= 2) GROUP BY 1),
      |allbg AS (
      |  SELECT doc_id, t.w1, t.w1 || ' ' || t.w2 AS bg FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS t
      |    FROM base WHERE len(ws) >= 2)),
      |perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(CASE WHEN c12 IS NULL THEN 20
      |             ELSE length(bin(c1)) - length(bin(c12)) END) AS BIGINT) AS bits_total
      |  FROM allbg LEFT JOIN refbg USING (bg) LEFT JOIN refuni USING (w1)
      |  GROUP BY doc_id),
      |avgd AS (SELECT doc_id, (bits_total * 1000000) // n_bigrams AS avg_micro FROM perdoc),
      |hist AS (SELECT avg_micro, COUNT(*) AS nv FROM avgd GROUP BY 1),
      |cumh AS (SELECT avg_micro, SUM(nv) OVER (ORDER BY avg_micro) AS cum FROM hist),
      |tot AS (SELECT COUNT(*) AS n FROM avgd),
      |thr AS (
      |  SELECT MIN(CASE WHEN cum * 3 >= n THEN avg_micro END) AS t1,
      |    MIN(CASE WHEN cum * 3 >= n * 2 THEN avg_micro END) AS t2
      |  FROM cumh, tot),
      |kept AS (
      |  SELECT a.doc_id,
      |    CASE WHEN a.avg_micro <= t.t1 THEN 1 WHEN a.avg_micro <= t.t2 THEN 2 ELSE 3 END AS bucket
      |  FROM avgd a, thr t
      |  WHERE CASE WHEN a.avg_micro <= t.t1 THEN 1 WHEN a.avg_micro <= t.t2 THEN 2 ELSE 3 END <= 2),
      |toks AS (
      |  SELECT k.doc_id, u.source,
      |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens, k.bucket
      |  FROM kept k JOIN cleaned c USING (doc_id) JOIN uniq u USING (doc_id)),
      |packed AS (
      |  SELECT doc_id, source, n_tokens, bucket,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM toks)
      |SELECT p.doc_id, p.source, c.n_paras, c.n_kept,
      |  CAST(p.bucket AS INTEGER) AS bucket, p.n_tokens,
      |  CAST((p.cum - p.n_tokens) // 512 AS BIGINT) AS pack_id
      |FROM packed p JOIN cleaned c USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  /** Q37 — scrubbing: numeric tokens redacted; output counts the redacted
    * tokens and digests the scrubbed text, so the redaction itself is
    * verified byte-exactly. */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t.rlike("^[0-9]+$")))
          .cast("long").as("n_numeric_tokens"),
        md5(TrainingPrep.scrubNumbers(col("text")).cast("binary")).as("scrubbed_digest"))
      .orderBy(col("doc_id"))

  val scrubSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT) AS n_numeric_tokens,
      |  md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS scrubbed_digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q152 — PII detection + redaction (TrainingPrep.scrubPii), the
    * Dolma/CCNet-style release gate: emails, IPv4 literals, and
    * international-format phone numbers detected and replaced in the
    * scrub order email → ip → phone. The corpus text is synthetic, so
    * PII is PLANTED deterministically per doc_id (the q147 fixture
    * discipline): every doc_id % 3 gets an email, % 5 an IP, % 7 a phone
    * — docs hit 0-3 of the patterns, including all overlaps. The oracle
    * replants identically and replays detection counts AND the scrubbed
    * digest with its own regex engine (RE2 vs Java — the patterns are
    * deliberately engine-portable), so a single mis-redacted byte fails
    * the hash. Map-only: scrubbing 100 TB is one narrow projection. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10."), col("doc_id") % 256, lit(".0."),
            col("doc_id") % 100)).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call +1-555-"), col("doc_id") % 9000 + 1000))
          .otherwise(lit(""))).as("t2"))
    planted
      .withColumn("c", TrainingPrep.piiCounts(col("t2")))
      .select(col("doc_id"),
        col("c.n_emails").cast("long").as("n_emails"),
        col("c.n_ips").cast("long").as("n_ips"),
        col("c.n_phones").cast("long").as("n_phones"),
        md5(TrainingPrep.scrubPii(col("t2")).cast("binary")).as("scrubbed_digest"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql: String = {
    import graft.ops.TrainingPrep.{EmailRe, Ipv4Re, PhoneRe}
    s"""WITH planted AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0
       |       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0
       |       THEN ' call +1-555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END AS t2
       |  FROM documents),
       |s1 AS (SELECT doc_id, t2, regexp_replace(t2, '$EmailRe', '<email>', 'g') AS t3 FROM planted),
       |s2 AS (SELECT doc_id, t2, t3, regexp_replace(t3, '$Ipv4Re', '<ip>', 'g') AS t4 FROM s1)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t2, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t3, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t4, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(t4, '$PhoneRe', '<phone>', 'g')) AS scrubbed_digest
       |FROM s2 ORDER BY doc_id""".stripMargin
  }

  /** Q38 — the end-to-end corpus-curation composition, ONE declarative
    * plan: quality gate (micro-score ≥ 0.70) ∩ exact-dedup canonicals ∩
    * near-dup cluster canonicals (simhash + connected components), then
    * leakage-safe split assignment and a per-(split, lang) rollup. This is
    * the whole point of the engine — what the reference ran as N
    * feedback-looped stream apps and a dedup pass that doesn't exist
    * there, Catalyst schedules as one DAG. Every stage reuses an
    * independently-oracled operator; the composite is oracled end-to-end
    * on top. */
  def curation(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.ops.Dedup
    val docs = Tables.documents(spark, dir)

    val quality = docs
      .filter(round(TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
        .cast("long") >= 700000L)
      .select(col("doc_id"), col("lang"), col("text"))

    val exactCanon = docs
      .groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))

    val sims = Dedup.simhashTable(docs, "doc_id", "text",
      hasher = TextFunctions.portableHash60)
    val dupLosers = Dedup.connectedComponents(Dedup.simhashNearDupPairs(sims, maxHamming = 7))
      .filter(col("cluster_id") =!= col("id"))
      .select(col("id").as("doc_id"))

    quality
      .join(exactCanon, quality("doc_id") === exactCanon("keep_id"), "left_semi")
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .select(
        TrainingPrep.splitAssign(col("doc_id")).as("split"),
        col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("split"), col("lang"))
  }

  val curationSql: String = {
    // the simhash CTE chain over the plain corpus, shared with q13/q33
    s"""WITH RECURSIVE ${DedupQueries.simhashCtesFor("SELECT doc_id, text FROM documents")},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 7),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, r.r AS r FROM edges e JOIN reach r ON e.dst = r.id),
       |losers AS (
       |  SELECT id FROM (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
       |  WHERE cluster_id <> id),
       |quality AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT doc_id, lang, text,
       |      CAST(round((0.3 * least(1.0, n / 50)
       |          + 0.3 * (nd / n)
       |          + 0.2 * (1.0 - dig / n)
       |          + 0.2 * least(1.0, ((length(text) - (n - 1)) / n) / 8)) * 1000000, 0) AS BIGINT) AS qm
       |    FROM (
       |      SELECT doc_id, lang, text,
       |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
       |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
       |        CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) AS dig
       |      FROM documents))
       |  WHERE qm >= 700000),
       |canon AS (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)),
       |kept AS (
       |  SELECT q.doc_id, q.lang, q.text FROM quality q
       |  JOIN canon c ON q.doc_id = c.keep_id
       |  WHERE q.doc_id NOT IN (SELECT id FROM losers)),
       |final AS (
       |  SELECT
       |    CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val' ELSE 'test' END AS split,
       |    lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang, text,
       |          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS pct
       |        FROM kept))
       |SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM final GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }

  /** Q41 — benchmark decontamination (train/test-overlap hygiene): every
    * doc_id % 97 == 0 doc plays the held-out benchmark; training docs
    * sharing any word 4-gram with one are flagged with the overlap count
    * and the lowest matching benchmark id. Benchmark shingles broadcast;
    * the train corpus streams through the join unshuffled
    * (TrainingPrep.decontaminate). */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TrainingPrep.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 4)
      .select(col("id").as("doc_id"), col("n_shared_shingles"), col("first_bench_id"))
      .orderBy(col("doc_id"))
  }

  val decontaminationSql: String =
    """WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN len(ws) < 4 THEN [text]
      |           ELSE list_distinct(list_transform(range(1, len(ws) - 2),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) END) AS sh
      |  FROM base),
      |bench AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0)
      |SELECT t.doc_id,
      |  CAST(count(DISTINCT t.sh) AS BIGINT) AS n_shared_shingles,
      |  min(b.bench_id) AS first_bench_id
      |FROM train t JOIN bench b USING (sh)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** Q162 — EVAL-SET contamination report (GPT-3 Appendix C; PaLM §7;
    * the clean/dirty-split measurement every model card publishes): for
    * each benchmark document (same doc_id % 97 split as q41/q88, so all
    * three decontamination views share one contract), the fraction of
    * its distinct word 4-grams that appear ANYWHERE in the training
    * corpus ([[TrainingPrep.evalOverlap]]); docs at ≥ 70% overlap are
    * `dirty` (the PaLM threshold). The census rolls up per eval SET
    * (the bench doc's source — each source plays one eval suite):
    * n_docs, n_dirty, exact integer mean overlap, and an
    * order-insensitive Σ overlap_micro·(bench_id mod 1000003) checksum
    * that pins every per-doc fraction through the aggregate. The
    * synthetic corpus has no verbatim bench-into-train leaks, so the
    * dirty verdict is exercised by PLANTING them: every train doc with
    * doc_id % 131 == 3 is re-labeled as a benchmark doc at
    * bench_id = doc_id + 2·10⁶ while its original stays in train — the
    * test-set-scraped-from-the-web incident this report exists to catch;
    * each replica must measure exactly 10⁶ micro (100% overlap). q41
    * answers "which TRAIN docs to drop"; this answers "which EVAL
    * numbers to trust" — different artifact, same hygiene pass. */
  def evalContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("id"), col("source"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") % 131 === 3 && col("doc_id") % 97 =!= 0)
        .select((col("doc_id") + 2000000L).as("id"), col("source"), col("text")))
    val per = TrainingPrep.evalOverlap(
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id").as("id"), col("text")),
      bench, "id", "text", n = 4)
      .join(broadcast(bench.select(col("id").as("bench_id"), col("source"))),
        "bench_id")
    per.groupBy(col("source").as("eval_set"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("overlap_micro") >= 700000L, 1L).otherwise(0L)).as("n_dirty"),
        expr("sum(overlap_micro) div count(1)").as("mean_overlap_micro"),
        sum(col("overlap_micro") * pmod(col("bench_id"), lit(1000003L)))
          .as("overlap_checksum"))
      .orderBy(col("eval_set"))
  }

  val evalContaminationSql: String =
    """WITH bench_docs AS (
      |  SELECT doc_id AS bench_id, source, text FROM documents WHERE doc_id % 97 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS bench_id, source, text FROM documents
      |  WHERE doc_id % 131 = 3 AND doc_id % 97 <> 0),
      |bbase AS (SELECT bench_id, source, text, string_split(text, ' ') AS ws FROM bench_docs),
      |bench AS (
      |  SELECT bench_id, source,
      |    unnest(CASE WHEN len(ws) < 4 THEN [text]
      |           ELSE list_distinct(list_transform(range(1, len(ws) - 2),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) END) AS sh
      |  FROM bbase),
      |tbase AS (SELECT text, string_split(text, ' ') AS ws FROM documents WHERE doc_id % 97 <> 0),
      |train AS (
      |  SELECT DISTINCT
      |    unnest(CASE WHEN len(ws) < 4 THEN [text]
      |           ELSE list_distinct(list_transform(range(1, len(ws) - 2),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) END) AS sh
      |  FROM tbase),
      |tot AS (SELECT bench_id, source, COUNT(*) AS n_grams FROM bench GROUP BY 1, 2),
      |ov AS (SELECT b.bench_id, COUNT(*) AS n_overlap
      |       FROM bench b JOIN train t USING (sh) GROUP BY 1),
      |per AS (
      |  SELECT bench_id, source, n_grams,
      |    COALESCE(n_overlap, 0) * 1000000 // n_grams AS overlap_micro
      |  FROM tot LEFT JOIN ov USING (bench_id))
      |SELECT source AS eval_set, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN overlap_micro >= 700000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty,
      |  CAST(SUM(overlap_micro) // COUNT(*) AS BIGINT) AS mean_overlap_micro,
      |  CAST(SUM(overlap_micro * (bench_id % 1000003)) AS BIGINT) AS overlap_checksum
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  /** The q42 mixture: target fractions 1, 1/2, 1/4, 1/8 cycling over the
    * source index — shared between the Spark query and the SQL oracle so
    * the two can never drift. */
  private val mixtureFractions: Seq[(String, Double)] =
    (0 until 20).map(i => s"src$i" -> 1.0 / (1 << (i % 4)))

  /** Q42 — deterministic mixture sampling (TrainingPrep.mixtureSample):
    * the kept per-source subsample under the target mixture, stable under
    * resharding/appends and nested under further downsampling. */
  def mixture(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.mixtureSample(Tables.documents(spark, dir), "doc_id", "source",
      mixtureFractions.toMap)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  val mixtureSql: String = {
    val values = mixtureFractions
      .map { case (s, f) => s"('$s', ${math.round(f * 1000000)})" }.mkString(", ")
    s"""WITH thr AS (SELECT * FROM (VALUES $values) t(source, mix_thresh)),
       |h AS (
       |  SELECT doc_id, source,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15)) AS BIGINT)
       |      % 1000000 AS hv
       |  FROM documents)
       |SELECT doc_id, source FROM h JOIN thr USING (source)
       |WHERE hv < mix_thresh ORDER BY doc_id""".stripMargin
  }

  /** Q59 — deterministic exact-count stratified sampling: exactly 25
    * docs per language, the reservoir-sample result as a pure function
    * of the data (smallest salted portable hashes win). Two-phase rank
    * (TrainingPrep.stratifiedSample) so few-strata data can't funnel the
    * whole table through one window partition; the oracle ranks in one
    * window — same result, different (scale-safe) execution. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.stratifiedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      "lang", "doc_id", k = 25)
      .select(col("lang"), col("sample_rank").cast("long").as("sample_rank"),
        col("doc_id"))
      .orderBy(col("lang"), col("sample_rank"))

  val stratifiedSampleSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15)) AS BIGINT) AS hv
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS sample_rank
      |  FROM h)
      |SELECT lang, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id
      |FROM r WHERE sample_rank <= 25
      |ORDER BY lang, sample_rank""".stripMargin

  /** Q88 — BLOOM-FILTER decontamination (TrainingPrep
    * .bloomDecontaminate) vs the exact broadcast pass, side by side: the
    * same train/bench split as q41, probed through a 2¹⁴-bit / 3-probe
    * Bloom filter built distributively from the benchmark shingles. The
    * output carries BOTH counts per flagged doc — the bloom hit count
    * and the exact overlap count (0 = a pure false positive; m is set to
    * 2¹⁴ here so the corpus genuinely produces some) — and the
    * oracle replays the portable hash, the double-hashed bit positions,
    * the per-word bit_or build, every bit test, AND the exact join, so
    * the filter's exact false-positive set is pinned bit-for-bit.
    * Bloom's no-false-negative guarantee is structural: every exact row
    * must appear among the bloom rows or the hash gate fails. */
  def bloomDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val bloom = TrainingPrep.bloomDecontaminate(train, bench, "doc_id", "text",
      n = 4, mBits = 1 << 14)
    val exact = TrainingPrep.decontaminate(train, bench, "doc_id", "text", n = 4)
      .select(col("id"), col("n_shared_shingles"))
    bloom.join(exact, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_hit_shingles"),
        coalesce(col("n_shared_shingles"), lit(0L)).as("n_exact_shingles"))
      .orderBy(col("doc_id"))
  }

  val bloomDecontaminationSql: String =
    """WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN len(ws) < 4 THEN [text]
      |           ELSE list_distinct(list_transform(range(1, len(ws) - 2),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) END) AS sh
      |  FROM base),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |bh AS (SELECT CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM bench),
      |pos AS (
      |  SELECT ((h % 1073741824) + t.i * ((h // 1073741824) | 1)) % 16384 AS pos
      |  FROM bh CROSS JOIN range(0, 3) t(i)),
      |words AS (
      |  SELECT pos // 32 AS w, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
      |  FROM pos GROUP BY 1),
      |train AS (
      |  SELECT doc_id, sh, CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h
      |  FROM sh WHERE doc_id % 97 <> 0),
      |tpos AS (
      |  SELECT doc_id, sh,
      |    ((h % 1073741824) + t.i * ((h // 1073741824) | 1)) % 16384 AS pos
      |  FROM train CROSS JOIN range(0, 3) t(i)),
      |hits AS (
      |  SELECT p.doc_id, p.sh
      |  FROM tpos p JOIN words w
      |    ON w.w = p.pos // 32 AND ((w.bits >> CAST(p.pos % 32 AS INT)) & 1) = 1
      |  GROUP BY p.doc_id, p.sh HAVING COUNT(*) = 3),
      |bloomdocs AS (
      |  SELECT doc_id, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_hit_shingles
      |  FROM hits GROUP BY doc_id),
      |exact AS (
      |  SELECT t.doc_id, CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_exact
      |  FROM train t JOIN bench b USING (sh) GROUP BY t.doc_id)
      |SELECT b.doc_id, b.n_hit_shingles,
      |  CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact_shingles
      |FROM bloomdocs b LEFT JOIN exact e USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Q169 — TEMPERATURE-BASED language reweighting (the multilingual
    * α-sampling recipe of mBERT/XLM-R: sample language i with
    * probability ∝ (nᵢ/N)^α instead of its natural share, flattening
    * the head so low-resource languages train at all): α = 0.5, so the
    * reweighted mass is sᵢ = √nᵢ — IEEE sqrt is correctly rounded, so
    * both engines derive the identical integer sᵢ = floor(√nᵢ · 1000)
    * and every share is exact integer arithmetic from there. Output per
    * language: token count, natural share, temperature share, and the
    * sampling multiplier (m‰ = temperature/natural) a mixture loader
    * applies. Shares divide as floor(n·1e6/total) on doubles (exact to
    * 2⁵³ tokens ≈ 9e15 — two orders above a 100 TB corpus).
    *
    * Scale: one map-side token count folded into a per-language hash
    * aggregate (bounded by |languages|), one broadcast total — content
    * never shuffles, the census never grows. */
  def temperatureSampling(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("s",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000.0)).cast("long"))
    val tot = perLang.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("s")).as("tot_s"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"),
        floor(col("n_tokens").cast("double") * lit(1000000.0) /
          col("tot_tokens").cast("double")).cast("long").as("base_share_micro"),
        floor(col("s").cast("double") * lit(1000000.0) /
          col("tot_s").cast("double")).cast("long").as("temp_share_micro"))
      .withColumn("multiplier_milli", expr(
        "CAST(temp_share_micro * 1000 DIV greatest(base_share_micro, 1) AS BIGINT)"))
      .orderBy(col("lang"))
  }

  val temperatureSamplingSql: String =
    """WITH pl AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |ws AS (
      |  SELECT lang, n_tokens,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000.0) AS BIGINT) AS s
      |  FROM pl),
      |tot AS (SELECT SUM(n_tokens) AS tot_tokens, SUM(s) AS tot_s FROM ws),
      |sh AS (
      |  SELECT lang, n_tokens,
      |    CAST(floor(CAST(n_tokens AS DOUBLE) * 1000000.0 /
      |         CAST(tot_tokens AS DOUBLE)) AS BIGINT) AS base_share_micro,
      |    CAST(floor(CAST(s AS DOUBLE) * 1000000.0 /
      |         CAST(tot_s AS DOUBLE)) AS BIGINT) AS temp_share_micro
      |  FROM ws, tot)
      |SELECT lang, n_tokens, base_share_micro, temp_share_micro,
      |  CAST(temp_share_micro * 1000 // greatest(base_share_micro, 1) AS BIGINT)
      |    AS multiplier_milli
      |FROM sh ORDER BY lang""".stripMargin

  /** Q174 — PADDING-WASTE census (the training-economics table that
    * justifies sequence packing): for each candidate context length L,
    * compare NAIVE one-document-per-sequence batching (each doc costs
    * ceil(n/L) sequences, the remainder padded) against CONCATENATED
    * packing at q36's semantics (each source block is a token stream
    * cut every L; padding only at each block's tail). Emits, per L:
    * token volume, sequence counts and padded tokens under both
    * regimes, and the share of padding that packing eliminates — the
    * number that decides whether a run pays the packing complexity.
    *
    * Scale: one corpus scan exploded ×|L| map-side, a (source, L) hash
    * aggregate (bounded by sources × lengths), then an |L|-row rollup —
    * no windows, no joins wider than the bounded census. */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("l", explode(array(lit(128L), lit(512L), lit(2048L))))
    val perSource = toks.groupBy(col("l"), col("source"))
      .agg(sum(col("n")).as("blk_tokens"),
        sum(expr("(n + l - 1) DIV l")).as("naive_seqs"))
    perSource.groupBy(col("l"))
      .agg(sum(col("blk_tokens")).as("total_tokens"),
        sum(col("naive_seqs")).as("naive_seqs"),
        sum(expr("(blk_tokens + l - 1) DIV l")).as("packed_seqs"))
      .withColumn("naive_pad_tokens",
        expr("CAST(naive_seqs * l - total_tokens AS BIGINT)"))
      .withColumn("packed_pad_tokens",
        expr("CAST(packed_seqs * l - total_tokens AS BIGINT)"))
      .withColumn("pad_saved_micro", expr(
        "CAST((naive_pad_tokens - packed_pad_tokens) * 1000000 " +
          "DIV greatest(naive_pad_tokens, 1) AS BIGINT)"))
      .select(col("l"), col("total_tokens"), col("naive_seqs"),
        col("naive_pad_tokens"), col("packed_seqs"),
        col("packed_pad_tokens"), col("pad_saved_micro"))
      .orderBy(col("l"))
  }

  val paddingWasteSql: String =
    """WITH ls AS (SELECT UNNEST([128, 512, 2048]) AS l),
      |toks AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n, l
      |  FROM documents, ls),
      |per_source AS (
      |  SELECT l, source, SUM(n) AS blk_tokens,
      |    SUM((n + l - 1) // l) AS naive_seqs
      |  FROM toks GROUP BY l, source),
      |per_l AS (
      |  SELECT l,
      |    CAST(SUM(blk_tokens) AS BIGINT) AS total_tokens,
      |    CAST(SUM(naive_seqs) AS BIGINT) AS naive_seqs,
      |    CAST(SUM((blk_tokens + l - 1) // l) AS BIGINT) AS packed_seqs
      |  FROM per_source GROUP BY l)
      |SELECT CAST(l AS BIGINT) AS l, total_tokens, naive_seqs,
      |  CAST(naive_seqs * l - total_tokens AS BIGINT) AS naive_pad_tokens,
      |  packed_seqs,
      |  CAST(packed_seqs * l - total_tokens AS BIGINT) AS packed_pad_tokens,
      |  CAST((naive_seqs * l - total_tokens - (packed_seqs * l - total_tokens))
      |       * 1000000 // greatest(naive_seqs * l - total_tokens, 1) AS BIGINT)
      |    AS pad_saved_micro
      |FROM per_l ORDER BY l""".stripMargin

  /** Q177 — PII-scrub EVALUATION against planted gold (the eval-family
    * move for the q152 release gate — a gate without measured recall is
    * a hope, not a control): deterministic emails / IPv4 literals /
    * phone numbers are planted into known documents, the PRODUCTION
    * detection and scrub kernels (TrainingPrep.piiCounts / scrubPii —
    * not re-implementations) run over the damaged corpus, and the
    * census reports per type: planted volume, detections, doc-level
    * recall, FALSE-POSITIVE docs (detections where nothing was
    * planted), and the residual detection count AFTER scrubbing —
    * which must be zero for the release-gate claim to mean anything.
    *
    * Scale: entirely map-side (plant + three regex counts + scrub +
    * recount per row) into a 3-row census — the eval costs one extra
    * corpus scan over the gate it certifies. */
  def piiEval(spark: SparkSession, dir: String): DataFrame = {
    val t2 = concat(col("text"),
      when(col("doc_id") % 11 === 0, concat(lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, concat(lit(" from 10."),
        (col("doc_id") % 200).cast("string"), lit(".3."),
        (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 17 === 0, concat(lit(" call +1555"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit("2468"))).otherwise(lit("")))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), t2.as("t2"))
      .withColumn("c", TrainingPrep.piiCounts(col("t2")))
      .withColumn("r", TrainingPrep.piiCounts(TrainingPrep.scrubPii(col("t2"))))
    base.select(col("doc_id"), explode(array(
        struct(lit("email").as("pii_type"), (col("doc_id") % 11 === 0).as("planted"),
          col("c.n_emails").cast("long").as("det"), col("r.n_emails").cast("long").as("resid")),
        struct(lit("ip").as("pii_type"), (col("doc_id") % 13 === 0).as("planted"),
          col("c.n_ips").cast("long").as("det"), col("r.n_ips").cast("long").as("resid")),
        struct(lit("phone").as("pii_type"), (col("doc_id") % 17 === 0).as("planted"),
          col("c.n_phones").cast("long").as("det"), col("r.n_phones").cast("long").as("resid"))))
        .as("x"))
      .select(col("x.pii_type").as("pii_type"), col("x.planted").as("planted"),
        col("x.det").as("det"), col("x.resid").as("resid"))
      .groupBy(col("pii_type"))
      .agg(sum(when(col("planted"), 1L).otherwise(0L)).as("n_planted"),
        sum(col("det")).as("n_detected"),
        sum(when(col("planted") && col("det") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(when(!col("planted") && col("det") > 0, 1L).otherwise(0L)).as("n_docs_fp"),
        sum(col("resid")).as("n_residual_after_scrub"))
      .withColumn("recall_micro",
        expr("CAST(n_docs_hit * 1000000 DIV greatest(n_planted, 1) AS BIGINT)"))
      .orderBy(col("pii_type"))
  }

  val piiEvalSql: String = {
    import TrainingPrep.{EmailRe, Ipv4Re, PhoneRe}
    s"""WITH m AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
       |      || '.3.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END ||
       |    CASE WHEN doc_id % 17 = 0 THEN ' call +1555'
       |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '2468' ELSE '' END AS t2
       |  FROM documents),
       |cnt AS (
       |  SELECT doc_id, t2,
       |    len(regexp_extract_all(t2, '$EmailRe')) AS e,
       |    len(regexp_extract_all(regexp_replace(t2, '$EmailRe', '<email>', 'g'),
       |        '$Ipv4Re')) AS ip,
       |    len(regexp_extract_all(regexp_replace(regexp_replace(t2,
       |        '$EmailRe', '<email>', 'g'), '$Ipv4Re', '<ip>', 'g'), '$PhoneRe')) AS ph,
       |    regexp_replace(regexp_replace(regexp_replace(t2,
       |      '$EmailRe', '<email>', 'g'), '$Ipv4Re', '<ip>', 'g'),
       |      '$PhoneRe', '<phone>', 'g') AS s2
       |  FROM m),
       |res AS (
       |  SELECT doc_id, e, ip, ph,
       |    len(regexp_extract_all(s2, '$EmailRe')) AS re,
       |    len(regexp_extract_all(regexp_replace(s2, '$EmailRe', '<email>', 'g'),
       |        '$Ipv4Re')) AS rip,
       |    len(regexp_extract_all(regexp_replace(regexp_replace(s2,
       |        '$EmailRe', '<email>', 'g'), '$Ipv4Re', '<ip>', 'g'), '$PhoneRe')) AS rph
       |  FROM cnt),
       |ex AS (
       |  SELECT 'email' AS pii_type, doc_id % 11 = 0 AS planted,
       |    CAST(e AS BIGINT) AS det, CAST(re AS BIGINT) AS resid FROM res
       |  UNION ALL
       |  SELECT 'ip', doc_id % 13 = 0, CAST(ip AS BIGINT), CAST(rip AS BIGINT) FROM res
       |  UNION ALL
       |  SELECT 'phone', doc_id % 17 = 0, CAST(ph AS BIGINT), CAST(rph AS BIGINT) FROM res)
       |SELECT pii_type,
       |  CAST(SUM(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
       |  CAST(SUM(det) AS BIGINT) AS n_detected,
       |  CAST(SUM(CASE WHEN planted AND det > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
       |  CAST(SUM(CASE WHEN NOT planted AND det > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_fp,
       |  CAST(SUM(resid) AS BIGINT) AS n_residual_after_scrub,
       |  CAST(SUM(CASE WHEN planted AND det > 0 THEN 1 ELSE 0 END) * 1000000
       |       // greatest(SUM(CASE WHEN planted THEN 1 ELSE 0 END), 1) AS BIGINT)
       |    AS recall_micro
       |FROM ex GROUP BY pii_type ORDER BY pii_type""".stripMargin
  }

  /** Q179 — PACKED TRAINING SHARDS, written and read back
    * ([[graft.ops.TokenShards]]): q158 orders the corpus and q36 packs
    * it, but a trainer mmaps BINARY token files — this query WRITES the
    * 16 fixed-width big-endian uint32 shard files in exactly the q158
    * permutation (portable token ids, one separator id per document,
    * per-shard build-once marker) and then emits its census FROM THE
    * FILES: token count, document count, and the order-sensitive
    * checksum Σ position·id mod 1e9+7. The oracle recomputes the same
    * census from the documents TABLE + the q158 hash deal, so the
    * row-hash comparison proves byte-for-byte that the written shards
    * encode the manifest permutation — the read-back verify is the
    * correctness gate itself, not a side assertion.
    *
    * Scale: the write is one exchange (shard repartition) + in-partition
    * sort + streamed per-file writers; the census scans the files once.
    * At 100 TB the shard COUNT scales at fixed shard size; both sides
    * of this query parallelize over shards. */
  def tokenShards(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TokenShards.shardCensus(spark, ensureShards(spark, dir))

  /** Build-once shard files per corpus dir ([[Tables.buildOnce]] — the
    * name segment is the LAYOUT version contract: big-endian uint32,
    * 16 shards, seed epoch1, vocab 1,000,003; changing any of them must
    * bump it or a stale tree would serve under the old marker). */
  private def ensureShards(spark: SparkSession, dir: String): String =
    Tables.buildOnce("graft_token_shards", dir, "u32be_s16_epoch1_v1000003") { out =>
      graft.ops.TokenShards.writeShards(
        Tables.documents(spark, dir), "doc_id", "text", out)
    }

  val tokenShardsSql: String =
    """WITH dealt AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
      |    list_transform(string_split(text, ' '),
      |      w -> CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % 1000003)
      |      || [CAST(1000003 AS BIGINT)] AS tids
      |  FROM documents),
      |pos AS (
      |  SELECT CAST(h % 16 AS BIGINT) AS shard, tids,
      |    row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS pos
      |  FROM dealt),
      |off AS (
      |  SELECT shard, pos, tids,
      |    COALESCE(SUM(len(tids)) OVER (PARTITION BY shard ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM pos),
      |tok AS (
      |  SELECT shard, off + t.i AS gpos, tids[t.i] AS tid
      |  FROM off, UNNEST(generate_series(1, len(tids))) AS t(i))
      |SELECT shard,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN tid = 1000003 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |  CAST(SUM((gpos * tid) % 1000000007) % 1000000007 AS BIGINT) AS checksum
      |FROM tok GROUP BY shard ORDER BY shard""".stripMargin

  /** Q183 — SHARD-MIXING audit: is the q158 shuffle actually well-mixed?
    * A trainer streaming shards in order needs every shard to look like
    * the global corpus — a language (or source) clumped into few shards
    * shows up as loss spikes mid-epoch. Per shard: the χ² statistic of
    * its language mix against the global mix (the q101 integer
    * convention — decimal-exact cross products, µ-unit floor division,
    * HUGEINT-replayed by the oracle), over the DENSE shard×lang grid so
    * absent cells contribute their full expected mass. The hash deal is
    * q158's exact permutation, so this audits the artifact the q179
    * shards materialize.
    *
    * Scale: one corpus pass into a (16 × |langs|) cell table, two
    * bounded rollups, one broadcast grid join — census cost. */
  def shardMixing(spark: SparkSession, dir: String): DataFrame = {
    val S = 16
    val cells = Tables.documents(spark, dir)
      .select(col("lang"),
        pmod(TrainingPrep.shuffleHash(col("doc_id"), "epoch1"), lit(S.toLong))
          .cast("int").as("shard"))
      .groupBy(col("shard"), col("lang"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // grid + three rollups read it
    val shardTot = cells.groupBy(col("shard")).agg(sum(col("o")).as("s"))
    val langTot = cells.groupBy(col("lang")).agg(sum(col("o")).as("l"))
    val total = cells.agg(sum(col("o")).as("n"))
    shardTot.crossJoin(broadcast(langTot)) // dense grid: zero cells count
      .join(cells, Seq("shard", "lang"), "left_outer")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("__d", expr("cast(o as decimal(38,0)) * n - cast(s as decimal(38,0)) * l"))
      .withColumn("contrib", expr(
        "cast(__d * __d * 1000000 div (cast(n as decimal(38,0)) * s * l) as bigint)"))
      .groupBy(col("shard"))
      .agg(max(col("s")).as("n_docs"), sum(col("contrib")).as("chi2_micro"))
      .orderBy(col("shard"))
  }

  val shardMixingSql: String =
    """WITH dealt AS (
      |  SELECT lang,
      |    CAST((CAST(('0x' || substring(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)) % 16 AS INTEGER) AS shard
      |  FROM documents),
      |cells AS (SELECT shard, lang, CAST(COUNT(*) AS BIGINT) AS o
      |          FROM dealt GROUP BY 1, 2),
      |st AS (SELECT shard, SUM(o) AS s FROM cells GROUP BY 1),
      |lt AS (SELECT lang, SUM(o) AS l FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(o) AS n FROM cells),
      |grid AS (
      |  SELECT st.shard, lt.lang, st.s, lt.l, COALESCE(c.o, 0) AS o
      |  FROM st CROSS JOIN lt
      |  LEFT JOIN cells c ON c.shard = st.shard AND c.lang = lt.lang),
      |x AS (
      |  SELECT shard, s,
      |    (o::HUGEINT * n - s::HUGEINT * l) AS dd, l
      |  FROM grid, tot),
      |contrib AS (
      |  SELECT shard, s,
      |    CAST(dd * dd * 1000000 // ((SELECT n FROM tot)::HUGEINT * s * l) AS BIGINT) AS c
      |  FROM x)
      |SELECT shard, CAST(MAX(s) AS BIGINT) AS n_docs,
      |  CAST(SUM(c) AS BIGINT) AS chi2_micro
      |FROM contrib GROUP BY shard ORDER BY shard""".stripMargin

  /** Q190 — EPOCH INDEPENDENCE: multi-epoch training reshuffles between
    * epochs, and the reshuffle is only worth its cost if epoch 2's
    * order is actually independent of epoch 1's (a correlated reshuffle
    * re-feeds the same neighborhoods in the same batches — the quiet
    * failure mode of seed-reuse bugs). The check: deal every doc under
    * BOTH epoch seeds and test each epoch-1 shard's distribution over
    * epoch-2 shards against uniformity — the q183 χ² convention over
    * the dense 16×16 transition grid. Independent hashes ⇒ χ² stays at
    * noise scale; a reused seed ⇒ the diagonal lights up (each row
    * collapses onto one epoch-2 shard and the statistic explodes).
    * One corpus pass into 256 cells + bounded rollups. */
  def epochIndependence(spark: SparkSession, dir: String): DataFrame = {
    val S = 16
    val cells = Tables.documents(spark, dir)
      .select(
        pmod(TrainingPrep.shuffleHash(col("doc_id"), "epoch1"), lit(S.toLong))
          .cast("int").as("shard1"),
        pmod(TrainingPrep.shuffleHash(col("doc_id"), "epoch2"), lit(S.toLong))
          .cast("int").as("shard2"))
      .groupBy(col("shard1"), col("shard2"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // grid + three rollups read it
    val rowTot = cells.groupBy(col("shard1")).agg(sum(col("o")).as("s"))
    val colTot = cells.groupBy(col("shard2")).agg(sum(col("o")).as("l"))
    val total = cells.agg(sum(col("o")).as("n"))
    rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("shard1", "shard2"), "left_outer")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("__d", expr("cast(o as decimal(38,0)) * n - cast(s as decimal(38,0)) * l"))
      .withColumn("contrib", expr(
        "cast(__d * __d * 1000000 div (cast(n as decimal(38,0)) * s * l) as bigint)"))
      .groupBy(col("shard1"))
      .agg(max(col("s")).as("n_docs"),
        sum(col("contrib")).as("chi2_micro"),
        max(col("o")).as("max_cell"))
      .orderBy(col("shard1"))
  }

  val epochIndependenceSql: String =
    """WITH dealt AS (
      |  SELECT
      |    CAST((CAST(('0x' || substring(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)) % 16 AS INTEGER) AS shard1,
      |    CAST((CAST(('0x' || substring(md5('epoch2:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)) % 16 AS INTEGER) AS shard2
      |  FROM documents),
      |cells AS (SELECT shard1, shard2, CAST(COUNT(*) AS BIGINT) AS o
      |          FROM dealt GROUP BY 1, 2),
      |st AS (SELECT shard1, SUM(o) AS s FROM cells GROUP BY 1),
      |lt AS (SELECT shard2, SUM(o) AS l FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(o) AS n FROM cells),
      |grid AS (
      |  SELECT st.shard1, lt.shard2, st.s, lt.l, COALESCE(c.o, 0) AS o
      |  FROM st CROSS JOIN lt
      |  LEFT JOIN cells c ON c.shard1 = st.shard1 AND c.shard2 = lt.shard2),
      |x AS (
      |  SELECT shard1, s, l, o,
      |    (o::HUGEINT * n - s::HUGEINT * l) AS dd
      |  FROM grid, tot),
      |contrib AS (
      |  SELECT shard1, s, o,
      |    CAST(dd * dd * 1000000 // ((SELECT n FROM tot)::HUGEINT * s * l) AS BIGINT) AS c
      |  FROM x)
      |SELECT shard1, CAST(MAX(s) AS BIGINT) AS n_docs,
      |  CAST(SUM(c) AS BIGINT) AS chi2_micro,
      |  CAST(MAX(o) AS BIGINT) AS max_cell
      |FROM contrib GROUP BY shard1 ORDER BY shard1""".stripMargin

  /** Q197 — CURATION-POLICY A/B diff (the policy-regression census a
    * pipeline runs BEFORE rolling a threshold change across 100 TB —
    * the q184 sensitivity move applied to the quality gate): policy A
    * keeps composite quality ≥ 0.70 (q17's gate); the candidate policy B
    * relaxes the threshold to 0.65 but adds a lexical-diversity floor
    * (distinct-token share ≥ 0.45, the repetition-spam guard). Every
    * document lands in exactly one transition cell — kept→kept,
    * kept→dropped, dropped→kept, dropped→dropped — with the flip CAUSE
    * attributed deterministically: a kept→dropped flip can only be the
    * new diversity gate (the threshold only relaxed); a dropped→kept
    * flip can only be the relaxed threshold (score in [0.65, 0.70) and
    * diversity-clean). Census per (lang, transition): docs, token mass,
    * and the share of the language's corpus that moves — the impact
    * statement reviewed before the rollout.
    *
    * Scale: both policies are row-local kernels over ONE scan; the
    * census is ≤ |langs|·4 rows. Nothing re-runs per policy. */
  def policyDiff(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("nd"),
        round(graft.functions.TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
          .cast("long").as("qm"))
      .withColumn("ds_micro", expr("CAST(nd * 1000000 DIV n AS BIGINT)"))
      .withColumn("kept_a", col("qm") >= 700000L)
      .withColumn("kept_b", col("qm") >= 650000L && col("ds_micro") >= 450000L)
    val cells = scored
      .withColumn("transition",
        when(col("kept_a") && col("kept_b"), "kept_kept")
          .when(col("kept_a") && !col("kept_b"), "kept_dropped")
          .when(!col("kept_a") && col("kept_b"), "dropped_kept")
          .otherwise("dropped_dropped"))
      .withColumn("cause",
        when(col("kept_a") && !col("kept_b"), "diversity_gate")
          .when(!col("kept_a") && col("kept_b"), "threshold_relaxed")
          .otherwise("stable"))
      .groupBy(col("lang"), col("transition"), col("cause"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .localCheckpoint(true) // consumers: per-lang share + output
    val perLang = cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("__lt"))
    cells.join(broadcast(perLang), Seq("lang"))
      .withColumn("lang_share_micro",
        expr("CAST(n_docs * 1000000 DIV __lt AS BIGINT)"))
      .drop("__lt")
      .orderBy(col("lang"), col("transition"))
  }

  val policyDiffSql: String =
    """WITH scored AS (
      |  SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd,
      |    CAST(round((0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50)
      |      + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |      + 0.2 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |                t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE)
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |      + 0.2 * least(1.0, ((length(text) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8)) * 1000000, 0) AS BIGINT) AS qm
      |  FROM documents),
      |flagged AS (
      |  SELECT lang, n,
      |    (qm >= 700000) AS kept_a,
      |    (qm >= 650000 AND nd * 1000000 // n >= 450000) AS kept_b
      |  FROM scored),
      |cells AS (
      |  SELECT lang,
      |    CASE WHEN kept_a AND kept_b THEN 'kept_kept'
      |         WHEN kept_a AND NOT kept_b THEN 'kept_dropped'
      |         WHEN NOT kept_a AND kept_b THEN 'dropped_kept'
      |         ELSE 'dropped_dropped' END AS transition,
      |    CASE WHEN kept_a AND NOT kept_b THEN 'diversity_gate'
      |         WHEN NOT kept_a AND kept_b THEN 'threshold_relaxed'
      |         ELSE 'stable' END AS cause,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n) AS BIGINT) AS n_tokens
      |  FROM flagged GROUP BY 1, 2, 3),
      |pl AS (SELECT lang, SUM(n_docs) AS lt FROM cells GROUP BY lang)
      |SELECT c.lang, c.transition, c.cause, c.n_docs, c.n_tokens,
      |  CAST(c.n_docs * 1000000 // p.lt AS BIGINT) AS lang_share_micro
      |FROM cells c JOIN pl p USING (lang)
      |ORDER BY c.lang, c.transition""".stripMargin

  /** Q200 — SPLIT-BALANCE audit (the companion gate to q35's assignment
    * and q182's leakage check: a hash split is leakage-safe by
    * construction but can still be UNREPRESENTATIVE — a language
    * over-drawn into test silently skews every eval number): per
    * (split, language), document counts, the language's share WITHIN the
    * split vs its share in the whole corpus, and the signed deviation.
    * The max |deviation| per split is the number a release gate bounds
    * (hash splits concentrate near 0 by construction; a large deviation
    * means the split key is correlated with language — the failure mode
    * this census exists to catch).
    *
    * Scale: one scan, a (split × lang) hash aggregate (bounded 3·|langs|
    * rows), two bounded broadcast joins. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    val assigned = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        TrainingPrep.splitAssign(col("doc_id")).as("split"))
    val cells = assigned.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true) // consumers: split totals + lang totals + grand total
    val splitTot = cells.groupBy(col("split")).agg(sum(col("n_docs")).as("__st"))
    val langTot = cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("__lt"))
    val grand = cells.agg(sum(col("n_docs")).as("__gt"))
    cells.join(broadcast(splitTot), Seq("split"))
      .join(broadcast(langTot), Seq("lang"))
      .crossJoin(broadcast(grand))
      .select(col("split"), col("lang"), col("n_docs"),
        expr("CAST(n_docs * 1000000 DIV __st AS BIGINT)").as("split_share_micro"),
        expr("CAST(__lt * 1000000 DIV __gt AS BIGINT)").as("global_share_micro"))
      .withColumn("dev_micro",
        (col("split_share_micro") - col("global_share_micro")).cast("long"))
      .orderBy(col("split"), col("lang"))
  }

  val splitBalanceSql: String =
    """WITH assigned AS (
      |  SELECT lang,
      |    CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT lang,
      |          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS pct
      |        FROM documents)),
      |cells AS (
      |  SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM assigned GROUP BY 1, 2),
      |st AS (SELECT split, SUM(n_docs) AS stot FROM cells GROUP BY split),
      |lt AS (SELECT lang, SUM(n_docs) AS ltot FROM cells GROUP BY lang),
      |gt AS (SELECT SUM(n_docs) AS gtot FROM cells)
      |SELECT c.split, c.lang, c.n_docs,
      |  CAST(c.n_docs * 1000000 // s.stot AS BIGINT) AS split_share_micro,
      |  CAST(l.ltot * 1000000 // g.gtot AS BIGINT) AS global_share_micro,
      |  CAST(CAST(c.n_docs * 1000000 // s.stot AS BIGINT)
      |    - CAST(l.ltot * 1000000 // g.gtot AS BIGINT) AS BIGINT) AS dev_micro
      |FROM cells c JOIN st s USING (split) JOIN lt l USING (lang)
      |CROSS JOIN gt g
      |ORDER BY c.split, c.lang""".stripMargin

  /** Q205 — TOKEN-BUDGET allocation under repeat caps (the
    * data-constrained-scaling allocation of Muennighoff et al. 2023:
    * when the training budget B exceeds the fresh-token supply, repeat
    * data — but cap repeats per source by QUALITY, because low-quality
    * text degrades past ~1 epoch while high-quality text holds value to
    * ~4): per source, token mass and a quality-tier repeat cap R_d
    * (mean composite quality ≥ 0.712 → 4 epochs, ≥ 0.705 → 2, else 1 —
    * cutoffs inside the corpus's observed per-source spread so all
    * three tiers are populated and the caps actually bind),
    * then exact WATER-FILLING of B = 2× the corpus: the supply curve
    * S(λ) = Σ_d mass_d·min(R_d, λ) is piecewise linear in the epoch
    * level λ with breakpoints at the tiers, so the crossing segment is
    * found by evaluating S at the ≤3 tier boundaries (a bounded cross
    * join — no window, no iteration) and λ* solved in closed form in
    * integer micro-epochs; λ* clamps to the max tier when even full
    * repetition cannot meet B (the shortfall the table exists to
    * expose). Output per source: mass, cap, allocated epochs (µ),
    * allocated tokens, and whether the cap clipped it.
    *
    * Scale: one scan for the (mass, quality) census (bounded by
    * |sources|), then arithmetic over tiers × sources bounded rows. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        round(graft.functions.TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
          .cast("long").as("qm"))
      .groupBy(col("source"))
      .agg(sum(col("nt")).as("mass"),
        expr("CAST(SUM(qm) DIV COUNT(1) AS BIGINT)").as("__mq"))
      .withColumn("r_cap",
        when(col("__mq") >= 712000L, 4L)
          .when(col("__mq") >= 705000L, 2L).otherwise(1L))
      .localCheckpoint(true) // supply curve + allocation both read it
    val budget = perSource.agg((sum(col("mass")) * 2).as("b"))
    // S(r) at each tier boundary r: Σ mass·min(r_cap, r); slope above r:
    // Σ mass over sources with r_cap > r
    val tiers = spark.range(1).select(explode(array(lit(0L), lit(1L), lit(2L), lit(4L))).as("r"))
    val curve = tiers.crossJoin(perSource)
      .groupBy(col("r"))
      .agg(sum(least(col("r_cap"), col("r")) * col("mass")).as("s_r"),
        sum(when(col("r_cap") > col("r"), col("mass")).otherwise(0L)).as("slope"))
      .crossJoin(broadcast(budget))
    // crossing segment: the largest boundary with S(r) <= B that still
    // has supply above it; λµ = rµ + (B - S(r))·1e6 / slope, clamped to 4
    val lam = curve
      .filter(col("s_r") <= col("b") && col("slope") > 0)
      .select(least(lit(4000000L),
        (col("r") * 1000000L +
          expr("CAST((b - s_r) * 1000000 DIV slope AS BIGINT)"))).as("lambda_micro"))
      .agg(max(col("lambda_micro")).as("lambda_micro"))
    perSource.crossJoin(broadcast(lam))
      .select(col("source"), col("mass"), col("r_cap"), col("lambda_micro"),
        least(col("lambda_micro"), col("r_cap") * 1000000L).as("epochs_micro"))
      .withColumn("alloc_tokens",
        expr("CAST(mass * epochs_micro DIV 1000000 AS BIGINT)"))
      .withColumn("clipped", col("epochs_micro") < col("lambda_micro"))
      .drop("lambda_micro")
      .orderBy(col("source"))
  }

  val tokenBudgetSql: String =
    """WITH per_source AS (
      |  SELECT source,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS mass,
      |    CAST(SUM(CAST(round((0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50)
      |      + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |      + 0.2 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |                t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE)
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |      + 0.2 * least(1.0, ((length(text) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8)) * 1000000, 0) AS BIGINT)) // COUNT(*) AS BIGINT) AS mq
      |  FROM documents GROUP BY source),
      |capped AS (
      |  SELECT source, mass,
      |    CASE WHEN mq >= 712000 THEN 4 WHEN mq >= 705000 THEN 2 ELSE 1 END AS r_cap
      |  FROM per_source),
      |budget AS (SELECT SUM(mass) * 2 AS b FROM capped),
      |curve AS (
      |  SELECT t.r,
      |    SUM(LEAST(c.r_cap, t.r) * c.mass) AS s_r,
      |    SUM(CASE WHEN c.r_cap > t.r THEN c.mass ELSE 0 END) AS slope
      |  FROM (SELECT UNNEST([0, 1, 2, 4]) AS r) t CROSS JOIN capped c
      |  GROUP BY t.r),
      |lam AS (
      |  SELECT MAX(LEAST(4000000,
      |    r * 1000000 + CAST((b - s_r) * 1000000 // slope AS BIGINT))) AS lambda_micro
      |  FROM curve, budget WHERE s_r <= b AND slope > 0)
      |SELECT c.source, c.mass, CAST(c.r_cap AS BIGINT) AS r_cap,
      |  CAST(LEAST(l.lambda_micro, c.r_cap * 1000000) AS BIGINT) AS epochs_micro,
      |  CAST(c.mass * LEAST(l.lambda_micro, c.r_cap * 1000000) // 1000000 AS BIGINT)
      |    AS alloc_tokens,
      |  (LEAST(l.lambda_micro, c.r_cap * 1000000) < l.lambda_micro) AS clipped
      |FROM capped c, lam l
      |ORDER BY c.source""".stripMargin

  /** Q206 — SOURCE-CONTAINMENT lineage (the dataset-provenance question
    * at the source level: is corpus A a re-release of corpus B? — C4 vs
    * Common Crawl, The Pile's overlapping subsets): exact-digest overlap
    * between every source pair, with directional containment share
    * (|A∩B| / |A| — near 10⁶ means A is inside B). The synthetic corpus
    * has no cross-source identical texts, so lineage is exercised by
    * PLANTING a 'mirror' re-release (every 7th document re-registered
    * under source 'mirror' at +2·10⁶ ids — the re-packaged-subset
    * incident this census detects). Only overlapping pairs emit (the
    * |sources|² zero rows carry no information).
    *
    * Scale: one md5-digest exchange keyed by (digest) — the q8 shape —
    * then a bounded (source_a, source_b) hash aggregate; the census
    * never exceeds |sources|². */
  def sourceContainment(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
    val corpus = base.select(col("doc_id"), col("source"), col("text"))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), lit("mirror").as("source"),
          col("text")))
    val digests = corpus
      .select(col("source"), md5(col("text").cast("binary")).as("d"))
      .distinct()
      .localCheckpoint(true) // both sides of the overlap join + sizes
    val sizes = digests.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val overlap = digests.as("a").join(digests.as("b"),
        col("a.d") === col("b.d") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    overlap
      .join(sizes.select(col("source").as("source_a"), col("n").as("n_a")),
        Seq("source_a"))
      .withColumn("containment_micro",
        expr("CAST(n_shared * 1000000 DIV n_a AS BIGINT)"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_shared"),
        col("containment_micro"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceContainmentSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, 'mirror' AS source, text
      |  FROM documents WHERE doc_id % 7 = 0),
      |digests AS (
      |  SELECT DISTINCT source, md5(text) AS d FROM corpus),
      |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM digests GROUP BY source),
      |overlap AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM digests a JOIN digests b ON a.d = b.d AND a.source <> b.source
      |  GROUP BY 1, 2)
      |SELECT o.source_a, o.source_b, s.n AS n_a, o.n_shared,
      |  CAST(o.n_shared * 1000000 // s.n AS BIGINT) AS containment_micro
      |FROM overlap o JOIN sizes s ON s.source = o.source_a
      |ORDER BY o.source_a, o.source_b""".stripMargin

  /** Q207 — CURRICULUM-ORDER manifest (Bengio et al. 2009, difficulty-
    * ordered training: feed easy documents first, hard ones later):
    * per-document difficulty = q199's LIX lexical-complexity score,
    * split into 10 curriculum STAGES at exact value-decile thresholds
    * (the q93 percentile_disc convention — equal scores share a stage,
    * derived from a cumulative histogram, never a global sort), and
    * WITHIN each stage the q158 reproducible order (seeded hash rank,
    * stage-partitioned). The manifest pins the entire curriculum the way
    * q158 pins the shuffle: per stage, doc count, difficulty bounds, the
    * head document, and the order-sensitive checksum
    * Σ position·(doc_id mod 1000003) — any transposition anywhere
    * changes a row. 10 bounded rows out.
    *
    * Scale: one map-side difficulty kernel, the histogram/threshold
    * pass (bounded, the OrderStats class), one stage-partitioned rank —
    * the q158 shape with stages for shards; no global sort anywhere. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n"),
        size(filter(toks, t => length(t) >= 7)).cast("long").as("n_long"))
      .withColumn("lix_milli",
        expr("CAST(n * 1000 + n_long * 100000 DIV n AS BIGINT)"))
      .select(col("doc_id"), col("lix_milli"))
      .localCheckpoint(true) // histogram + assignment both read it
    val hist = graft.ops.OrderStats
      .cumHistogram(perDoc.select(col("lix_milli")), "lix_milli")
      .localCheckpoint(true) // total + 9 threshold scans
    val tot = hist.agg(sum(col("nv")).as("n"))
    val tcols = (1 to 9).map(k =>
      min(when(col("cum") * 10 >= col("n") * k, col("lix_milli"))).as(s"t$k"))
    val thr = hist.crossJoin(broadcast(tot)).agg(tcols.head, tcols.tail: _*)
    val staged = perDoc.crossJoin(broadcast(thr))
      .withColumn("stage",
        (1 to 9).foldLeft(lit(10)) { (e, k) =>
          // evaluated outside-in: the SMALLEST matching threshold wins,
          // so build from t9 down to t1
          when(col("lix_milli") <= col(s"t${10 - k}"), 10 - k).otherwise(e)
        }.cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("stage")).orderBy(
          graft.ops.TrainingPrep.shuffleHash(col("doc_id"), "curriculum1"),
          col("doc_id"))).cast("long"))
    staged.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("lix_milli")).as("lix_lo"),
        max(col("lix_milli")).as("lix_hi"),
        min_by(col("doc_id"), col("pos")).as("first_doc"),
        sum(col("pos") * pmod(col("doc_id"), lit(1000003L))).as("order_sum"))
      .orderBy(col("stage"))
  }

  val curriculumOrderSql: String =
    """WITH perdoc AS (
      |  SELECT doc_id,
      |    CAST(n * 1000 + n_long * 100000 // n AS BIGINT) AS lix_milli
      |  FROM (SELECT doc_id,
      |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |          CAST(len(list_filter(string_split(text, ' '),
      |            t -> length(t) >= 7)) AS BIGINT) AS n_long
      |        FROM documents)),
      |hist AS (SELECT lix_milli, COUNT(*) AS nv FROM perdoc GROUP BY 1),
      |cumh AS (SELECT lix_milli, SUM(nv) OVER (ORDER BY lix_milli) AS cum FROM hist),
      |tot AS (SELECT COUNT(*) AS n FROM perdoc),
      |thr AS (
      |  SELECT
      |    MIN(CASE WHEN cum * 10 >= n * 1 THEN lix_milli END) AS t1,
      |    MIN(CASE WHEN cum * 10 >= n * 2 THEN lix_milli END) AS t2,
      |    MIN(CASE WHEN cum * 10 >= n * 3 THEN lix_milli END) AS t3,
      |    MIN(CASE WHEN cum * 10 >= n * 4 THEN lix_milli END) AS t4,
      |    MIN(CASE WHEN cum * 10 >= n * 5 THEN lix_milli END) AS t5,
      |    MIN(CASE WHEN cum * 10 >= n * 6 THEN lix_milli END) AS t6,
      |    MIN(CASE WHEN cum * 10 >= n * 7 THEN lix_milli END) AS t7,
      |    MIN(CASE WHEN cum * 10 >= n * 8 THEN lix_milli END) AS t8,
      |    MIN(CASE WHEN cum * 10 >= n * 9 THEN lix_milli END) AS t9
      |  FROM cumh, tot),
      |staged AS (
      |  SELECT p.doc_id, p.lix_milli,
      |    CASE WHEN p.lix_milli <= t.t1 THEN 1
      |         WHEN p.lix_milli <= t.t2 THEN 2
      |         WHEN p.lix_milli <= t.t3 THEN 3
      |         WHEN p.lix_milli <= t.t4 THEN 4
      |         WHEN p.lix_milli <= t.t5 THEN 5
      |         WHEN p.lix_milli <= t.t6 THEN 6
      |         WHEN p.lix_milli <= t.t7 THEN 7
      |         WHEN p.lix_milli <= t.t8 THEN 8
      |         WHEN p.lix_milli <= t.t9 THEN 9
      |         ELSE 10 END AS stage,
      |    CAST(('0x' || substring(md5('curriculum1:' || CAST(p.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM perdoc p, thr t),
      |positioned AS (
      |  SELECT stage, doc_id, lix_milli,
      |    CAST(row_number() OVER (PARTITION BY stage ORDER BY h, doc_id) AS BIGINT) AS pos
      |  FROM staged)
      |SELECT CAST(stage AS INTEGER) AS stage,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(lix_milli) AS BIGINT) AS lix_lo,
      |  CAST(MAX(lix_milli) AS BIGINT) AS lix_hi,
      |  CAST(min_by(doc_id, pos) AS BIGINT) AS first_doc,
      |  CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_sum
      |FROM positioned GROUP BY stage ORDER BY stage""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q207_curriculum_order", curriculumOrder, Some(curriculumOrderSql)),
    QueryDef("q205_token_budget", tokenBudget, Some(tokenBudgetSql)),
    QueryDef("q206_source_containment", sourceContainment, Some(sourceContainmentSql)),
    QueryDef("q197_policy_diff", policyDiff, Some(policyDiffSql)),
    QueryDef("q200_split_balance", splitBalance, Some(splitBalanceSql)),
    QueryDef("q190_epoch_independence", epochIndependence, Some(epochIndependenceSql)),
    QueryDef("q183_shard_mixing", shardMixing, Some(shardMixingSql)),
    QueryDef("q179_token_shards", tokenShards, Some(tokenShardsSql)),
    QueryDef("q174_padding_waste", paddingWaste, Some(paddingWasteSql)),
    QueryDef("q177_pii_eval", piiEval, Some(piiEvalSql)),
    QueryDef("q169_temperature_sampling", temperatureSampling,
      Some(temperatureSamplingSql)),
    QueryDef("q70_repeated_spans", repeatedSpans, Some(repeatedSpansSql)),
    QueryDef("q88_bloom_decontam", bloomDecontamination, Some(bloomDecontaminationSql)),
    QueryDef("q72_span_scrub", spanScrub, Some(spanScrubSql)),
    QueryDef("q35_dataset_split", datasetSplit, Some(datasetSplitSql)),
    QueryDef("q158_training_shuffle", trainingShuffle, Some(trainingShuffleSql)),
    QueryDef("q36_token_packing", tokenPacking, Some(tokenPackingSql)),
    QueryDef("q100_curation_pipeline", curationPipeline, Some(curationPipelineSql)),
    QueryDef("q160_curation_log", curationLog, Some(curationLogSql)),
    QueryDef("q37_scrub", scrub, Some(scrubSql)),
    QueryDef("q152_pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("q38_curation", curation, Some(curationSql)),
    QueryDef("q41_decontamination", decontamination, Some(decontaminationSql)),
    QueryDef("q162_eval_contamination", evalContamination, Some(evalContaminationSql)),
    QueryDef("q42_mixture", mixture, Some(mixtureSql)),
    QueryDef("q59_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("q117_priority_sample", prioritySampleQuery, Some(prioritySampleSql)))

  /** Q117 — length-weighted corpus subsampling by PRIORITY sampling
    * (TrainingPrep.prioritySample; Duffield/Lund/Thorup 2007): top-5
    * docs per source by priority w·2^60 div (h+1) with w = word count —
    * heavier documents proportionally likelier, every draw a
    * deterministic exact integer the oracle replays (hash, priority,
    * clamp, per-stratum ranks). The weighted counterpart of q59. */
  def prioritySampleQuery(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.prioritySample(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_words")),
      "source", "doc_id", "n_words", k = 5)
      .select(col("source"), col("sample_rank").cast("long").as("sample_rank"),
        col("doc_id"), col("n_words"), col("priority"))
      .orderBy(col("source"), col("sample_rank"))

  val prioritySampleSql: String =
    """WITH base AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':prio'), 1, 15)) AS BIGINT) AS h
      |  FROM documents),
      |pr AS (
      |  SELECT source, doc_id, n_words,
      |    CAST(least(n_words::HUGEINT * 1152921504606846976 // (h + 1),
      |               4611686018427387904::HUGEINT) AS BIGINT) AS priority
      |  FROM base),
      |rk AS (
      |  SELECT source, doc_id, n_words, priority,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY priority DESC, doc_id) AS sample_rank
      |  FROM pr)
      |SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank,
      |  doc_id, n_words, priority
      |FROM rk WHERE sample_rank <= 5
      |ORDER BY source, sample_rank""".stripMargin
}
