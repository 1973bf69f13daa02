package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Document-pipeline surface over the `documents` table
  * (SURVEY.md §2E Q2/Q3/Q4/Q8).
  *
  * The testdata documents are punctuation-free word sequences, so chunking
  * is word-level (reference ChunkType.WORD) and fixed-width word windows
  * (paragraph analog) — reference: model/src/main/kotlin/datatypes/datarecords.kt:6-12.
  */
object DocumentQueries {

  /** Q3 — doc → chunk explode with ordinal index and parent FK
    * (the reference's ChunkProducer flatMap,
    * reference: pipeline/impl/KafkaIntelligencePipeline.kt:142-145).
    * Scale: narrow flatMap, no shuffle; ordinal comes from the array
    * position, not a window function. */
  def wordChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("idx", "word")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("word"))
      .orderBy(col("doc_id"), col("idx"))

  val wordChunksSql: String =
    """SELECT doc_id, i - 1 AS idx, words[i] AS word
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |     UNNEST(generate_series(1, len(words))) AS t(i)
      |ORDER BY doc_id, idx""".stripMargin

  /** Q3b — fixed-width (10-word) window chunks with ordinal, the
    * paragraph-shaped chunking. All array-native (transform/slice), no
    * shuffle, no UDF. */
  def windowChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("chunks", expr(
        "transform(sequence(0, cast(ceil(size(words)/10.0) as int) - 1)," +
          " i -> concat_ws(' ', slice(words, i*10 + 1, 10)))"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("idx", "chunk")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("chunk"),
        (size(split(col("chunk"), " "))).cast("long").as("n_words"))
      .orderBy(col("doc_id"), col("idx"))

  val windowChunksSql: String =
    """SELECT doc_id, i AS idx,
      |  array_to_string(words[(i*10)+1:(i+1)*10], ' ') AS chunk,
      |  len(words[(i*10)+1:(i+1)*10]) AS n_words
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |     UNNEST(generate_series(0, CAST(ceil(len(words)/10.0) AS BIGINT) - 1)) AS t(i)
      |ORDER BY doc_id, idx""".stripMargin

  /** Q4 — parent/child join + group-collect rollup
    * (the reference's DataRecordWithChunks session aggregate,
    * reference: KafkaIntelligencePipelineTests.kt:315-333).
    * Chunks are re-derived and joined back to the parent, then collapsed —
    * the deterministic scalar projection of collect_list. */
  def docChunkRollup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val chunks = wordChunks(spark, dir)
    import graft.functions.NativeExpressions.{argMaxBy, argMinBy}
    val rollup = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      argMinBy(col("word"), col("idx"), lit(0L)).as("first_word"),
      argMaxBy(col("word"), col("idx"), lit(0L)).as("last_word"),
      max(length(col("word"))).cast("long").as("max_word_len"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(rollup, Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  val docChunkRollupSql: String =
    """SELECT d.doc_id, d.lang, d.n_chars,
      |  len(words) AS n_chunks,
      |  words[1] AS first_word,
      |  words[-1] AS last_word,
      |  list_max(list_transform(words, w -> length(w))) AS max_word_len
      |FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS words
      |      FROM documents) d
      |ORDER BY d.doc_id""".stripMargin

  /** Q2 — idempotent enrichment: add a derived lang only where no provider
    * already supplied one (the reference's "not already enriched by me"
    * gate, reference: KafkaIntelligencePipeline.kt:227-242). Docs with
    * doc_id % 3 == 0 carry pre-seeded metadata; the enricher must skip
    * them. Implemented with an array-of-struct meta column and an
    * `exists()` predicate — the columnar form of the reference's
    * `meta.any { it.createdBy == name }`. */
  def idempotentEnrich(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val seeded = docs.withColumn("meta",
      when(col("doc_id") % 3 === 0,
        array(struct(lit("seed").as("created_by"), col("lang").as("value"))))
        .otherwise(array().cast("array<struct<created_by:string,value:string>>")))
    val needs = !expr("exists(meta, m -> m.created_by = 'langid')") &&
      !expr("exists(meta, m -> m.created_by = 'seed')")
    val enriched = seeded.withColumn("meta",
      when(needs, concat(col("meta"), array(struct(lit("langid").as("created_by"),
        when(col("text").contains(" the "), lit("en")).otherwise(lit("xx")).as("value")))))
        .otherwise(col("meta")))
    enriched.select(
      col("doc_id"),
      size(col("meta")).cast("long").as("n_meta"),
      expr("meta[0].created_by").as("lang_source"),
      expr("meta[0].value").as("final_lang"))
      .orderBy(col("doc_id"))
  }

  val idempotentEnrichSql: String =
    """SELECT doc_id, CAST(1 AS BIGINT) AS n_meta,
      |  CASE WHEN doc_id % 3 = 0 THEN 'seed' ELSE 'langid' END AS lang_source,
      |  CASE WHEN doc_id % 3 = 0 THEN lang
      |       WHEN contains(text, ' the ') THEN 'en' ELSE 'xx' END AS final_lang
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Q8 — content-hash dedup groups (reference HashMetadataProducer,
    * reference: participants/implementations.kt:41-52). Hash-groupBy is the
    * exact-dedup primitive: one shuffle on the digest, canonical id =
    * min(doc_id) per group. */
  def contentDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("digest", md5(col("text").cast("binary")))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("digest"))

  val contentDedupSql: String =
    """SELECT md5(text) AS digest, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY digest""".stripMargin

  /** Chunk-level language detection rolled up to the parent record — the
    * reference's chunk-metadata producer pattern (chunk enrichment lands
    * keyed by the PARENT record,
    * reference: KafkaIntelligencePipeline.kt:103-125) with B4's per-chunk
    * language detection (participants/implementations.kt:189-198).
    * Chunks are 10-word windows; per doc: chunk count, chunks classified
    * 'en', and the language of the first chunk. */
  def chunkLangRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val chunks = windowChunks(spark, dir)
      .withColumn("chunk_lang", TextFunctions.langId(col("chunk")))
    chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("chunk_lang") === "en", 1L).otherwise(0L)).as("n_en_chunks"),
      graft.functions.NativeExpressions.argMinBy(
        col("chunk_lang"), col("idx"), lit(0L)).as("first_chunk_lang"))
      .orderBy(col("doc_id"))
  }

  val chunkLangRollupSql: String = {
    def hits(lang: String): String = {
      val list = graft.functions.TextFunctions.Stopwords.toMap.apply(lang)
        .map(w => s"'$w'").mkString(", ")
      s"len(list_intersect(list_distinct(string_split(chunk, ' ')), [$list]))"
    }
    s"""WITH chunks AS (
       |  SELECT doc_id, i AS idx,
       |    array_to_string(words[(i*10)+1:(i+1)*10], ' ') AS chunk
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |       UNNEST(generate_series(0, CAST(ceil(len(words)/10.0) AS BIGINT) - 1)) AS t(i)),
       |scored AS (
       |  SELECT doc_id, idx,
       |    CASE WHEN ${hits("en")} = 0 AND ${hits("de")} = 0 AND ${hits("es")} = 0 AND ${hits("fr")} = 0 THEN 'und'
       |         WHEN ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("es")} AND ${hits("en")} >= ${hits("fr")} THEN 'en'
       |         WHEN ${hits("de")} >= ${hits("es")} AND ${hits("de")} >= ${hits("fr")} THEN 'de'
       |         WHEN ${hits("es")} >= ${hits("fr")} THEN 'es'
       |         ELSE 'fr' END AS chunk_lang
       |  FROM chunks),
       |ranked AS (
       |  SELECT doc_id, chunk_lang,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx ASC) AS rn
       |  FROM scored)
       |SELECT s.doc_id,
       |  COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN s.chunk_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en_chunks,
       |  MAX(CASE WHEN r.rn = 1 THEN r.chunk_lang END) AS first_chunk_lang
       |FROM scored s
       |JOIN ranked r ON s.doc_id = r.doc_id AND r.rn = 1
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  /** Q140 — per-source DATASET CARDS: the one-scan corpus summary a
    * data-governance review reads first — per source: document and
    * token volume, mean integer quality (q17's micro-unit signal,
    * truncating division), exact-duplicate rate (docs beyond their
    * digest group's first), and the majority language with its share in
    * permille (ties to the lexicographically smallest lang). Two tiny
    * per-source aggregates + one |sources|-keyed window — everything
    * after the scan is source-cardinality work. */
  def datasetCards(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, dir)
    val base = docs
      .withColumn("q_micro",
        round(TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("q_micro")).as("__qsum"),
        countDistinct(md5(col("text").cast("binary"))).as("__ndistinct"))
    val langs = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("c").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("majority_lang"), col("c").as("__langn"))
    base.join(langs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("__qsum div n_docs").as("mean_quality_micro"),
        (col("n_docs") - col("__ndistinct")).as("n_dup_docs"),
        col("majority_lang"),
        expr("__langn * 1000 div n_docs").as("lang_share_permille"))
      .orderBy(col("source"))
  }

  val datasetCardsSql: String =
    """WITH q AS (
      |  SELECT source, lang, text,
      |    CAST(round((0.3 * least(1.0, n / 50)
      |        + 0.3 * (nd / n)
      |        + 0.2 * (1.0 - dig / n)
      |        + 0.2 * least(1.0, ((length(text) - (n - 1)) / n) / 8)) * 1000000, 0) AS BIGINT) AS q_micro,
      |    CAST(n AS BIGINT) AS n_words
      |  FROM (
      |    SELECT source, lang, text,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |      CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) AS dig
      |    FROM documents)),
      |base AS (
      |  SELECT source, COUNT(*) AS n_docs, SUM(n_words) AS n_tokens,
      |    SUM(q_micro) AS qsum, COUNT(DISTINCT md5(text)) AS ndistinct
      |  FROM q GROUP BY 1),
      |lng AS (
      |  SELECT source, lang, COUNT(*) AS c,
      |    row_number() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, lang ASC) AS rn
      |  FROM q GROUP BY source, lang)
      |SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs,
      |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(b.qsum // b.n_docs AS BIGINT) AS mean_quality_micro,
      |  CAST(b.n_docs - b.ndistinct AS BIGINT) AS n_dup_docs,
      |  l.lang AS majority_lang,
      |  CAST(l.c * 1000 // b.n_docs AS BIGINT) AS lang_share_permille
      |FROM base b JOIN lng l ON l.source = b.source AND l.rn = 1
      |ORDER BY b.source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q140_dataset_cards", datasetCards, Some(datasetCardsSql)),
    QueryDef("q26_chunk_lang_rollup", chunkLangRollup, Some(chunkLangRollupSql)),
    QueryDef("q3_word_chunks", wordChunks, Some(wordChunksSql)),
    QueryDef("q3b_window_chunks", windowChunks, Some(windowChunksSql)),
    QueryDef("q4_doc_chunk_rollup", docChunkRollup, Some(docChunkRollupSql)),
    QueryDef("q2_idempotent_enrich", idempotentEnrich, Some(idempotentEnrichSql)),
    QueryDef("q8_content_dedup", contentDedup, Some(contentDedupSql)))
}
