package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The facts/capability surface (SURVEY.md §2E Q9/Q10): first-match
  * provider resolution and max-confidence proposition evaluation. */
object FactsQueries {

  /** Q9 — first-match resolution across ranked providers (the capability
    * registry's "execute all, take first non-null",
    * reference: pipeline/capabilities/DefaultCapabilityRegistry.kt:11-18).
    * Columnar form: `coalesce` over priority-ordered provider expressions —
    * fully codegen'd, zero shuffle. */
  def firstMatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val p1 = when(col("lang") === "en", upper(col("source")))
    val p2 = when(col("n_chars") > 200, lit("long"))
    val p3 = lit("default")
    docs.select(
      col("doc_id"),
      coalesce(p1, p2, p3).as("resolved"),
      when(p1.isNotNull, "p1").when(p2.isNotNull, "p2").otherwise("p3").as("provider"))
      .orderBy(col("doc_id"))
  }

  val firstMatchSql: String =
    """SELECT doc_id,
      |  COALESCE(CASE WHEN lang = 'en' THEN upper(source) END,
      |           CASE WHEN n_chars > 200 THEN 'long' END,
      |           'default') AS resolved,
      |  CASE WHEN lang = 'en' THEN 'p1'
      |       WHEN n_chars > 200 THEN 'p2'
      |       ELSE 'p3' END AS provider
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Q10 — max-confidence proposition per subject (the MaxScore evaluator,
    * reference: model/src/main/kotlin/facts/implementations.kt:6-14).
    * Three synthetic providers propose with deterministic confidences; the
    * evaluator is the native argmax over the (confidence, provider)
    * ordering — commutative, partial-aggregation friendly, and
    * hash-aggregated (`max` over a struct would fall back to
    * SortAggregate; see NativeExpressions.ArgMaxByOrd). */
  def maxConfidence(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NativeExpressions.argMaxBy
    val docs = Tables.documents(spark, dir)
    def conf(a: Int, b: Int) =
      ((col("doc_id") * a + b) % 1000).cast("double") / 1000
    val props = docs.select(col("doc_id"), explode(array(
      struct(conf(7, 13).as("confidence"), lit("tika").as("provider")),
      struct(conf(11, 5).as("confidence"), lit("stanford").as("provider")),
      struct(conf(17, 29).as("confidence"), lit("azure").as("provider"))
    )).as("prop"))
    props.groupBy(col("doc_id"))
      .agg(
        argMaxBy(col("prop.provider"), col("prop.confidence"), col("prop.provider"))
          .as("best_provider"),
        max(col("prop.confidence")).as("best_conf"))
      .orderBy(col("doc_id"))
  }

  val maxConfidenceSql: String =
    """WITH props AS (
      |  SELECT doc_id, CAST((doc_id * 7 + 13) % 1000 AS DOUBLE) / 1000 AS confidence, 'tika' AS provider FROM documents
      |  UNION ALL
      |  SELECT doc_id, CAST((doc_id * 11 + 5) % 1000 AS DOUBLE) / 1000, 'stanford' FROM documents
      |  UNION ALL
      |  SELECT doc_id, CAST((doc_id * 17 + 29) % 1000 AS DOUBLE) / 1000, 'azure' FROM documents),
      |ranked AS (
      |  SELECT doc_id, confidence, provider,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY confidence DESC, provider DESC) AS rn
      |  FROM props)
      |SELECT doc_id, provider AS best_provider, confidence AS best_conf
      |FROM ranked WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q9_first_match", firstMatch, Some(firstMatchSql)),
    QueryDef("q10_max_confidence", maxConfidence, Some(maxConfidenceSql)))
}
