package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** End-to-end document pipeline: ingest → consolidation fold → dependency-
  * ordered enrichment. The batch mirror of the reference's full topology
  * (§3.1-3.2): what Kafka ran as N feedback-looped stream apps is one
  * linear Spark plan — scan → fold (1 shuffle) → single-pass enrichment.
  *
  * Scale: the only shuffle is the consolidation groupBy on the record id;
  * enrichment is narrow; nothing is collected to the driver.
  */
object DocumentPipeline {

  /** Ingest the testdata `documents` table as CREATE events. Text rides
    * inline in the representation (InlineContentResolver); `id` is the
    * caller-visible doc_id (stable, join-friendly). For path-keyed
    * corpora use `xxhash64(path)` instead (SURVEY.md §7.4). */
  def ingestDocuments(spark: SparkSession, dir: String): Dataset[DataRecordEvent] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(
        lit(Command.Create).as("command"),
        col("doc_id").as("id"),
        lit(1L).as("timestamp"),
        lit(0L).as("seq"),
        concat(lit("doc-"), col("doc_id")).as("name"),
        struct(col("text").as("path"), lit("inline").as("createdBy")).as("representation"),
        lit(null).cast("struct<values:map<string,string>,createdBy:string>").as("meta"))
      .as[DataRecordEvent]
  }

  /** Consolidated + enriched records for a testdata directory. */
  def enrichedRecords(spark: SparkSession, dir: String,
      enrichers: Seq[Enricher] = StandardEnrichers.all()): Dataset[DataRecord] =
    Enrichers.enrich(Consolidate.batch(ingestDocuments(spark, dir)), enrichers)

  /** Flattened metadata view: one row per (record, enricher, key, value) —
    * the shape the oracle checks and downstream analytics consume. */
  def metadataRows(records: Dataset[DataRecord]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      r.meta.flatMap(m => m.values.toSeq.map { case (k, v) =>
        (r.id, r.name, m.createdBy, k, v)
      })
    }.toDF("id", "name", "created_by", "key", "value")
  }
}
