package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TrainingPrep
import graft.sources.Tables

/** Training-data preparation surface (q35-q37) — deterministic splits,
  * token packing, scrubbing; all exact-oracle-backed. */
object PrepQueries {

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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q35_dataset_split", datasetSplit, Some(datasetSplitSql)),
    QueryDef("q36_token_packing", tokenPacking, Some(tokenPackingSql)),
    QueryDef("q37_scrub", scrub, Some(scrubSql)))
}
