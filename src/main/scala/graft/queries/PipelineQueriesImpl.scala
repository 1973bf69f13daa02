package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.pipeline._
import graft.sources.Tables

/** Pipeline-core query surface: the consolidation fold and the full
  * enrichment pipeline, both oracle-checked end-to-end. */
object PipelineQueriesImpl {

  /** Q21 — the event-fold consolidation operator itself (SURVEY §2 A11),
    * fed a deliberately adversarial synthetic log per document:
    * two CREATEs (latest must win), a duplicated metadata upsert (set
    * semantics must collapse it — the reference's at-least-once
    * tolerance), and one representation upsert. */
  def eventFold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).as[(Long, String, String)]
    val events = docs.flatMap { case (id, lang, text) =>
      val meta = Metadata(Map("lang" -> lang), "seed")
      Seq(
        DataRecordEvent.create(id, s"doc-$id-v1", DocumentRepresentation(text, "inline"), 1L, 0L),
        DataRecordEvent.create(id, s"doc-$id-v2", DocumentRepresentation(text, "inline"), 2L, 0L),
        DataRecordEvent.upsertMeta(id, meta, 3L, 0L),
        DataRecordEvent.upsertMeta(id, meta, 4L, 1L), // duplicate → must collapse
        DataRecordEvent.upsertRepresentation(id, DocumentRepresentation(s"/out/$id.txt", "tika-txt"), 5L, 0L))
    }
    Consolidate.batch(events)
      .map(r => (r.id, r.name, r.timestamp,
        r.meta.size.toLong, r.additionalRepresentations.size.toLong,
        r.metaBy("seed").flatMap(_.values.get("lang")).orNull))
      .toDF("id", "name", "timestamp", "n_meta", "n_reps", "lang")
      .orderBy(col("id"))
  }

  val eventFoldSql: String =
    """SELECT doc_id AS id,
      |  'doc-' || doc_id || '-v2' AS name,
      |  CAST(2 AS BIGINT) AS timestamp,
      |  CAST(1 AS BIGINT) AS n_meta,
      |  CAST(1 AS BIGINT) AS n_reps,
      |  lang
      |FROM documents ORDER BY id""".stripMargin

  /** Q22 — the full pipeline (ingest → fold → dependency-ordered
    * enrichment) flattened to metadata rows; every standard enricher's
    * output is recomputed independently by the SQL oracle. */
  def enrichmentPipeline(spark: SparkSession, dir: String): DataFrame =
    DocumentPipeline.metadataRows(DocumentPipeline.enrichedRecords(spark, dir))
      .select(col("id"), col("created_by"), col("key"), col("value"))
      .orderBy(col("id"), col("created_by"), col("key"))

  val enrichmentPipelineSql: String = {
    val langCase = {
      def hits(lang: String): String = {
        val list = graft.functions.TextFunctions.Stopwords.toMap.apply(lang)
          .map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(list_distinct(string_split(text, ' ')), [$list]))"
      }
      s"""CASE WHEN ${hits("en")} = 0 AND ${hits("de")} = 0 AND ${hits("es")} = 0 AND ${hits("fr")} = 0 THEN 'und'
         |     WHEN ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("es")} AND ${hits("en")} >= ${hits("fr")} THEN 'en'
         |     WHEN ${hits("de")} >= ${hits("es")} AND ${hits("de")} >= ${hits("fr")} THEN 'de'
         |     WHEN ${hits("es")} >= ${hits("fr")} THEN 'es'
         |     ELSE 'fr' END""".stripMargin
    }
    val qualityMicro =
      """CAST(CAST(round((0.3 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE) / 50)
        | + 0.3 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
        | + 0.2 * (1.0 - CAST(len(list_filter(string_split(text,' '), t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
        | + 0.2 * least(1.0, ((length(text) - (len(string_split(text,' ')) - 1)) / CAST(len(string_split(text,' ')) AS DOUBLE)) / 8)) * 1000000, 0) AS BIGINT) AS VARCHAR)""".stripMargin
    val fp =
      s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(range(1, 1 + length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
         |  (a, c) -> (a * 31 + c) % ${graft.functions.TextFunctions.FingerprintMod}) AS VARCHAR)""".stripMargin
    s"""WITH d AS (SELECT doc_id AS id, text FROM documents)
       |SELECT id, created_by, key, value FROM (
       |  SELECT id, 'hash' AS created_by, 'sha256' AS key, sha256(text) AS value FROM d
       |  UNION ALL SELECT id, 'lang', 'lang', $langCase FROM d
       |  UNION ALL SELECT id, 'quality', 'quality_micro', $qualityMicro FROM d
       |  UNION ALL SELECT id, 'tokens', 'n_tokens', CAST(len(string_split(text, ' ')) AS VARCHAR) FROM d
       |  UNION ALL SELECT id, 'tokens', 'n_bpe', CAST(len(regexp_extract_all(text, '${graft.functions.TextFunctions.BpePattern}')) AS VARCHAR) FROM d
       |  UNION ALL SELECT id, 'fingerprint', 'fp', $fp FROM d)
       |ORDER BY id, created_by, key""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q21_event_fold", eventFold, Some(eventFoldSql)),
    QueryDef("q22_enrichment_pipeline", enrichmentPipeline, Some(enrichmentPipelineSql)))
}
