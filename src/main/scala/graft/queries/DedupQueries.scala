package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Dedup

/** Near-duplicate detection surface (north-star Q12 family).
  * Exact dedup is q8_content_dedup in DocumentQueries.
  */
object DedupQueries {

  /** The corpus plus deterministic near-duplicates: every 5th document is
    * re-added with its first word dropped (id offset +10,000,000). Gives
    * the near-dup operators a known planted signal to find — the corpus
    * itself has no exact duplicates. */
  private def withPlantedNearDups(docs: DataFrame): DataFrame = {
    val planted = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))").as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(planted)
  }

  /** MinHash+LSH near-dup pairs (32 perms, 8 bands × 4 rows, Jaccard ≥ 0.5
    * verification). Not SQL-expressible (xxhash64 signatures) → rows-only
    * check; correctness is covered by MinHashSpec (planted-pair recall)
    * and the deterministic plan. */
  def minhashNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(
      withPlantedNearDups(Tables.documents(spark, dir)),
      "doc_id", "text", shingleN = 3, k = 32, bands = 8, jaccardThreshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash table over the corpus — deterministic 64-bit signatures.
    * Rows-only check (xxhash64 not available in the oracle engine). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashTable(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("id"))

  /** SimHash near-dup pairs (hamming ≤ 16 over planted near-dups). */
  def simhashNearDups(spark: SparkSession, dir: String): DataFrame = {
    val sims = Dedup.simhashTable(
      withPlantedNearDups(Tables.documents(spark, dir)), "doc_id", "text")
    Dedup.simhashNearDupPairs(sims, maxHamming = 16)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** n-gram (bigram) Jaccard similarity, blocked by `source` — fully
    * SQL-expressible, so this one carries the exact-match oracle for the
    * whole Jaccard family. Only pairs ≥ 0.05 to keep output bounded. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, dir),
      "doc_id", "text", blockCol = "source", shingleN = 2, threshold = 0.05)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  // oracle keeps the naive per-pair intersect form — the inverted-index
  // rewrite must produce identical values (n_a + n_b - common == |A∪B|)

  val ngramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(words) >= 2
      |         THEN list_distinct([words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))])
      |         ELSE [text] END AS s
      |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS words FROM documents))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |  CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jaccard
      |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |      CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.05
      |ORDER BY id_a, id_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q12_minhash_neardup", minhashNearDups, None),
    QueryDef("q13_simhash", simhashSignatures, None),
    QueryDef("q13b_simhash_neardup", simhashNearDups, None),
    QueryDef("q14_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)))
}
