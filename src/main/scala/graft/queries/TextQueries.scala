package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._

/** Text-analysis query surface (north-star Q12 family): language-ID,
  * quality scoring, token counting, fingerprinting over `documents`. */
object TextQueries {

  /** Language-ID by stopword-profile argmax with priority tie-break. */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), langId(col("text")).as("predicted"), col("lang"),
        (langId(col("text")) === col("lang")).as("is_match"))
      .orderBy(col("doc_id"))

  private def hitsSql(lang: String): String = {
    val words = Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_intersect(list_distinct(string_split(text, ' ')), [$words]))"
  }

  val langIdSql: String = {
    val (hEn, hDe, hEs, hFr) = (hitsSql("en"), hitsSql("de"), hitsSql("es"), hitsSql("fr"))
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $hEn AS h_en, $hDe AS h_de, $hEs AS h_es, $hFr AS h_fr
       |  FROM documents),
       |pred AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN h_en = 0 AND h_de = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
       |         WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
       |         WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
       |         WHEN h_es >= h_fr THEN 'es'
       |         ELSE 'fr' END AS predicted
       |  FROM scored)
       |SELECT doc_id, predicted, lang, predicted = lang AS is_match
       |FROM pred ORDER BY doc_id""".stripMargin
  }

  /** Composite quality score in exact integer micro-units — rounding the
    * raw double to N decimals is engine-hazardous at half-ulp boundaries
    * (observed at sf0.1: 0.708437 vs 0.708438); scaling to 1e6 and
    * rounding at scale 0 is exact because the pre-round double is
    * identical in both engines. */
  def qualityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        round(qualityScoreRaw(col("text")) * 1000000, 0).cast("long").as("quality_micro"))
      .orderBy(col("doc_id"))

  val qualitySql: String =
    """SELECT doc_id,
      |  CAST(round((0.3 * least(1.0, n / 50)
      |      + 0.3 * (nd / n)
      |      + 0.2 * (1.0 - dig / n)
      |      + 0.2 * least(1.0, ((length(text) - (n - 1)) / n) / 8)) * 1000000, 0) AS BIGINT) AS quality_micro
      |FROM (
      |  SELECT doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |    CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) AS dig
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Whitespace + BPE-ish token counts. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe"))
      .orderBy(col("doc_id"))

  val tokenCountsSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(regexp_extract_all(text, '$BpePattern')) AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling-hash document fingerprint (mod 1e9+7, exact BIGINT). */
  def fingerprintQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 1 + length(text)),
       |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
       |    (a, c) -> (a * 31 + c) % $FingerprintMod) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q16_lang_id", langIdQuery, Some(langIdSql)),
    QueryDef("q17_quality_score", qualityQuery, Some(qualitySql)),
    QueryDef("q18_token_counts", tokenCounts, Some(tokenCountsSql)),
    QueryDef("q19_fingerprint", fingerprintQuery, Some(fingerprintSql)))
}
